"""Project the NEXT round's driver window and rotation debt.

Mechanizes the boundary arithmetic the BREADTH-BUDGET rule
(plans/catalog.py) depends on: given the committed CORRECTNESS
history plus an assumed green outcome for the current first-50
window, print what the next round's 50 slots would hold, which
entries spill, and the projected rotation debt / breadth budget.
Reuses the catalog's own _base_rank / _rotation_debt so the
projection cannot drift from the ordering policy.

Usage: python tools/window_plan.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from lichess_db_spark.plans import catalog

    last_green = dict(catalog._last_green_round())
    rnd = catalog._ROUND
    window_now = list(catalog.queries_map())[:50]
    # assume the pending driver round greens the current window (both
    # hash rows and rows-only rows count as green in _last_green_round)
    for n in window_now:
        last_green[n] = rnd

    nxt = rnd + 1
    # next-round ordering: the boundary clears STAGED_NEXT/_TOUCHED, so
    # the projection is the catalog's marker-independent base ranking
    ordered = sorted(
        catalog.QUERIES, key=lambda n: catalog._base_rank(catalog.QUERIES[n], last_green)
    )
    window_next = ordered[:50]
    debt = catalog._rotation_debt(last_green, nxt)
    budget = max(0, catalog._WINDOW_SIZE - debt)
    print(f"projected r{nxt} window (assuming r{rnd} greens its 50):")
    for i, n in enumerate(window_next):
        print(f"  {i:2d} {n:42s} last_green={last_green.get(n, '-')}")
    spill = [
        n
        for n in ordered[50:]
        if catalog.QUERIES[n].oracle is not None
        and last_green.get(n, 99) <= nxt - 4
    ]
    print(f"\nprojected rotation debt at r{nxt}: {debt}  breadth budget: {budget}")
    print(
        f"staleness>3 oracle-paired entries spilling past the r{nxt} window: {len(spill)}"
    )
    for n in spill:
        print(f"  spill {n} last_green={last_green.get(n)}")


if __name__ == "__main__":
    main()
