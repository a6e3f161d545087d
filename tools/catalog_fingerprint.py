"""Per-entry source fingerprints for the query catalog.

Mechanizes the driver-window rotation invariant (VERDICT r4 item 2):
any catalog entry whose implementing source changed since the last
driver round must re-enter the first-50 driver window via
``_TOUCHED_THIS_ROUND`` in ``plans/catalog.py``.

The fingerprint of an entry is the md5 of ``inspect.getsource`` of its
registered builder.  Because builders are registered via the
``@register(name, oracle, ...)`` decorator, the retrieved source spans
the decorator call too, so the oracle SQL is covered by the same hash.
(Helper functions a builder calls are NOT covered — a helper-only
change still needs a manual ``_TOUCHED`` entry; the fingerprint is a
backstop, not a replacement for review.)

Usage:
    python tools/catalog_fingerprint.py            # print current fingerprints
    python tools/catalog_fingerprint.py --write    # refresh the committed snapshot

Run ``--write`` exactly once per round, at the round boundary (after
the final commit's content is settled), so the next round's test
compares against the state the driver actually verified.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(REPO, "lichess_db_spark", "plans", "catalog_fingerprints.json")


def current_fingerprints() -> dict[str, str]:
    sys.path.insert(0, REPO)
    from lichess_db_spark.plans.registry import QUERIES
    import lichess_db_spark.plans.catalog  # noqa: F401  (registration side effects)

    out = {}
    for name, q in QUERIES.items():
        src = inspect.getsource(q.build)
        out[name] = hashlib.md5(src.encode()).hexdigest()
    return dict(sorted(out.items()))


def load_snapshot() -> dict[str, str]:
    with open(SNAPSHOT) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="refresh the committed snapshot")
    args = ap.parse_args()
    fps = current_fingerprints()
    if args.write:
        with open(SNAPSHOT, "w") as f:
            json.dump(fps, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(fps)} fingerprints to {SNAPSHOT}")
    else:
        try:
            snap = load_snapshot()
        except FileNotFoundError:
            snap = {}
        changed = [n for n, h in fps.items() if snap.get(n) != h]
        print(json.dumps({"total": len(fps), "changed_vs_snapshot": changed}, indent=1))


if __name__ == "__main__":
    main()
