"""Mechanized driver-window rotation invariant (VERDICT r4 item 2).

The grading driver verifies only the first 50 entries of
``queries()``.  The manual ``_TOUCHED_THIS_ROUND`` discipline in
``plans/catalog.py`` worked in r3-r4 but was one forgotten edit away
from silently-unverified code.  These tests make the invariant
executable:

1. every catalog entry whose builder source changed since the last
   driver round (fingerprint differs from the committed snapshot, or
   the entry is new) must sit inside the first-50 window;
2. every entry with no green driver row in any committed
   CORRECTNESS_r*.json must sit inside the window;
3. the core sentinels must sit inside the window;
4. the ``_TOUCHED_THIS_ROUND`` names must all resolve (typo guard).

The snapshot (``plans/catalog_fingerprints.json``) is refreshed once
per round boundary via ``python tools/catalog_fingerprint.py --write``.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_fingerprint_tool():
    spec = importlib.util.spec_from_file_location(
        "catalog_fingerprint", os.path.join(REPO, "tools", "catalog_fingerprint.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _catalog():
    sys.path.insert(0, REPO)
    from lichess_db_spark.plans import catalog

    return catalog


def test_touched_names_resolve():
    catalog = _catalog()
    unknown = [n for n in catalog._TOUCHED_THIS_ROUND if n not in catalog.QUERIES]
    assert not unknown, f"_TOUCHED_THIS_ROUND contains unregistered names: {unknown}"
    unknown_sent = [n for n in catalog._CORE_SENTINELS if n not in catalog.QUERIES]
    assert not unknown_sent, f"_CORE_SENTINELS contains unregistered names: {unknown_sent}"


def test_window_contains_touched_unverified_and_sentinels():
    catalog = _catalog()
    window = set(list(catalog.queries_map())[:50])

    missing_touched = [n for n in catalog._TOUCHED_THIS_ROUND if n not in window]
    assert not missing_touched, f"touched entries outside driver window: {missing_touched}"

    last_green = catalog._last_green_round()
    never = [n for n in catalog.QUERIES if n not in last_green]
    # STAGED_NEXT entries are never-green BY DESIGN this round: they
    # were authored after the window was frozen at the mandated
    # >=30-re-green floor and deliberately rank at the tail (see
    # plans/catalog_staged.py); test_staged_entries_rank_at_tail pins
    # their placement instead.
    missing_never = [
        n for n in never if n not in window and n not in catalog.STAGED_NEXT
    ]
    assert not missing_never, f"never-driver-verified entries outside window: {missing_never}"

    missing_sent = [n for n in catalog._CORE_SENTINELS if n not in window]
    assert not missing_sent, f"core sentinels outside window: {missing_sent}"


def test_changed_builders_reenter_window():
    """Any entry whose builder source drifted from the committed
    snapshot must be in the first-50 window (add it to
    _TOUCHED_THIS_ROUND), or the snapshot must be refreshed if the
    driver already verified the new source."""
    catalog = _catalog()
    tool = _load_fingerprint_tool()
    snap = tool.load_snapshot()
    current = tool.current_fingerprints()

    changed = [n for n, h in current.items() if snap.get(n) != h]
    window = set(list(catalog.queries_map())[:50])
    escaped = [
        n for n in changed if n not in window and n not in catalog.STAGED_NEXT
    ]
    assert not escaped, (
        f"builder source changed since last driver round but entry is outside "
        f"the first-50 window: {escaped} — add to _TOUCHED_THIS_ROUND in plans/catalog.py"
    )


def test_ordering_is_deterministic():
    catalog = _catalog()
    a = list(catalog.queries_map())
    b = list(catalog.queries_map())
    assert a == b
    assert len(a) == len(set(a))


def test_breadth_budget():
    """Standing BREADTH-BUDGET rule (VERDICT r11 item 2): new
    oracle-paired entries per round <= (window size - rotation debt),
    rotation debt = oracle-paired entries whose last green driver row
    is older than staleness 3. 'New this round' = never-green and not
    in _TOUCHED_THIS_ROUND (which carries the PRIOR round's staged
    entries). When the debt leaves no budget, every new entry must be
    in STAGED_NEXT (tail) so the window drains the oldest tail
    instead."""
    catalog = _catalog()
    lg = catalog._last_green_round()
    budget = max(0, catalog._WINDOW_SIZE - catalog._rotation_debt(lg))
    new_this_round = [
        n
        for n, q in catalog.QUERIES.items()
        if q.oracle is not None
        and n not in lg
        and n not in catalog._TOUCHED_THIS_ROUND
    ]
    in_window_new = [n for n in new_this_round if n not in catalog.STAGED_NEXT]
    assert len(in_window_new) <= budget, (
        f"breadth budget exceeded: {len(in_window_new)} new oracle-paired "
        f"entries rank into the window but rotation debt leaves a budget of "
        f"{budget} — stage the excess in STAGED_NEXT: {in_window_new}"
    )


def test_staged_entries_rank_at_tail():
    """STAGED_NEXT entries (authored after this round's window froze
    at the mandated re-green floor) must: resolve, register a full
    oracle, rank strictly AFTER the 50-slot driver window, and stay
    out of _TOUCHED_THIS_ROUND (mutually exclusive markers)."""
    catalog = _catalog()
    names = list(catalog.queries_map())
    for n in catalog.STAGED_NEXT:
        assert n in catalog.QUERIES, f"STAGED_NEXT name does not resolve: {n}"
        assert catalog.QUERIES[n].oracle is not None, (
            f"staged entry {n} must be full-oracle (pre-verified at two SFs)"
        )
        assert names.index(n) >= 50, f"staged entry {n} leaked into the window"
        assert n not in catalog._TOUCHED_THIS_ROUND


def test_window_matches_committed_snapshot():
    """The composed driver window is THE round deliverable: pin the
    exact first-50 list to a committed snapshot so a late registration
    or ordering change cannot silently reshuffle it between
    pre-verification and the driver run. Refresh the snapshot (and
    re-pre-verify the window) whenever the composition legitimately
    changes: python - <<'PY'
    import json; from lichess_db_spark.plans import catalog
    json.dump({"round": catalog._ROUND,
               "window": list(catalog.queries_map())[:50]},
              open("lichess_db_spark/plans/window_snapshot.json", "w"), indent=1)
    PY"""
    import json

    catalog = _catalog()
    path = os.path.join(
        REPO, "lichess_db_spark", "plans", "window_snapshot.json"
    )
    with open(path) as f:
        snap = json.load(f)
    assert snap["round"] == catalog._ROUND, (
        "window snapshot is from another round — refresh it at the boundary. "
        "NOTE (ADVICE r12): _last_green_round() reads CORRECTNESS_r*.json "
        "from the repo root at runtime, so a newly-dropped driver record "
        "re-ranks the live window; the record must land in the SAME commit "
        "as the boundary refresh (_ROUND bump + window_snapshot.json + "
        "catalog_fingerprints.json) so the tree never sits mismatched."
    )
    assert list(catalog.queries_map())[:50] == snap["window"], (
        "live first-50 window deviates from the committed pin — if a new "
        "CORRECTNESS_r*.json just landed, run the round-boundary procedure "
        "(bump _ROUND, refresh window_snapshot.json + "
        "catalog_fingerprints.json) in the same commit; if a builder "
        "changed mid-round, add it to _TOUCHED_THIS_ROUND and re-refresh "
        "the snapshot + re-pre-verify the window"
    )
