"""Project the NEXT round's driver window and rotation debt.

Mechanizes the boundary arithmetic the BREADTH-BUDGET rule
(plans/catalog.py) depends on: given the committed CORRECTNESS
history plus an assumed green outcome for the current first-50
window, print what the next round's 50 slots would hold, which
entries spill, and the projected rotation debt / breadth budget.

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
    # assume the pending driver round greens the current window
    for n in window_now:
        q = catalog.QUERIES[n]
        if q.oracle is not None or n in last_green or True:
            last_green[n] = rnd

    nxt = rnd + 1

    def rank(name: str):
        q = catalog.QUERIES[name]
        if name not in last_green:
            return (1, 0)
        if name in catalog._CORE_SENTINELS:
            return (2, 0)
        if q.oracle is None:
            return (5, last_green[name])
        return (3, last_green[name])

    names = list(catalog.QUERIES)
    ordered = sorted(names, key=rank)
    window_next = ordered[:50]
    debt = sum(
        1
        for n, q in catalog.QUERIES.items()
        if q.oracle is not None
        and n in last_green
        and nxt - last_green[n] > 3
    )
    budget = max(0, catalog._WINDOW_SIZE - debt)
    print(f"projected r{nxt} window (assuming r{rnd} greens its 50):")
    for i, n in enumerate(window_next):
        lg = last_green.get(n, "-")
        print(f"  {i:2d} {n:42s} last_green={lg}")
    spill = [
        n
        for n in ordered[50:]
        if catalog.QUERIES[n].oracle is not None
        and last_green.get(n, 99) <= nxt - 4
    ]
    print(f"\nprojected rotation debt at r{nxt}: {debt}  breadth budget: {budget}")
    print(f"staleness>3 oracle-paired entries spilling past the r{nxt} window: {len(spill)}")
    for n in spill:
        print(f"  spill {n} last_green={last_green.get(n)}")


if __name__ == "__main__":
    main()
