"""Generate the next round's ``_DRIVER_PRIORITY`` window from the
CORRECTNESS history — makes the rotation mechanical instead of
hand-curated (the hand-curated r8 window mislabeled its exclusions;
ADVICE r8).

Policy (the same one every round has applied by hand):

1. every query with NO driver evidence at all (never checked) —
   these can only earn their first green by being in the window;
2. then the stalest greens, oldest ``newest_green`` first (ties:
   name order), filling the 50 driver slots;
3. queries that were checked and FAILED in their newest round would
   sort first of all — none exist today (nothing has ever failed),
   but the policy handles it: red evidence outranks stale green.

Prints the ready-to-paste tuple body plus a deferral summary.  It
does NOT rewrite catalog.py — the window is load-bearing enough that
a human (or the next round's builder) should paste and review it;
tests/test_freshness.py then enforces the invariants.

Run from the repo root:  python tools/rotate_window.py
"""

from __future__ import annotations

import sys

WINDOW = 50


def propose(root: str = ".") -> tuple[list[str], list[tuple[str, int]]]:
    sys.path.insert(0, root)
    from tools.freshness import build

    fresh = build(root)
    q = fresh["queries"]

    def rank(name: str):
        rec = q[name]
        green = rec["newest_green"]
        if green is None and rec["ever_failed"]:
            return (0, name)  # red evidence: most urgent
        if green is None:
            return (1, name)  # never checked
        return (2, green, name)  # stalest green first

    ordered = sorted(q, key=rank)
    window, deferred = ordered[:WINDOW], ordered[WINDOW:]
    # deferral summary: only queries at/near the staleness horizon
    horizon = fresh["latest_round"] - 2
    at_risk = [
        (n, q[n]["newest_green"])
        for n in deferred
        if q[n]["newest_green"] is not None and q[n]["newest_green"] <= horizon
    ]
    return window, at_risk


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    window, at_risk = propose(root)
    print("# paste into wire_spark/catalog.py _DRIVER_PRIORITY:")
    print("_DRIVER_PRIORITY: tuple[str, ...] = (")
    for n in window:
        print(f'    "{n}",')
    print(")")
    if at_risk:
        print(f"\n# deferred near the staleness horizon ({len(at_risk)}):")
        for n, g in sorted(at_risk, key=lambda t: (t[1], t[0])):
            print(f"#   {n} (newest green r{g})")
