"""Compute the next driver-window rotation for _DRIVER_ROW_PRIORITY.

The driver's CORRECTNESS gate records hard rows for only the FIRST 50
entries of ``queries()`` (= ``_DRIVER_ROW_PRIORITY`` order), so each
round the window must rotate onto queries with no driver row yet —
zero repeats of prior rounds (the judge checks this against the union
of CORRECTNESS_r0*.json).

This tool reads every CORRECTNESS_r0*.json in the repo root, prints
coverage stats, and emits a proposed next priority list:

1. all never-driver-checked queries (stable current-priority order) —
   if more than 50 remain, the window is just the first 50 of them;
2. once fewer than 50 remain, the window is padded with the queries
   whose most RECENT driver row is oldest (ties: current order), so
   hard rows also refresh continuously;
3. everything else keeps its current relative order.

Usage: python tools/next_window.py            # report + proposed head
       python tools/next_window.py --emit     # print the full python
                                              # list literal to paste
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pippin_spark.entry_queries import ENTRY_QUERIES, _DRIVER_ROW_PRIORITY

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_round = {}
    rounds = []
    for f in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rn = int("".join(ch for ch in os.path.basename(f) if ch.isdigit()))
        rounds.append(rn)
        try:
            rows = json.load(open(f))
        except Exception as e:  # truncated artifact: skip, report
            print(f"WARN: {f} unreadable ({e})", file=sys.stderr)
            continue
        for name in rows:
            last_round[name] = max(rn, last_round.get(name, 0))

    # registrations missing from the priority list are brand-new
    # queries: they go to the FRONT (matching
    # _apply_driver_row_priority's unlisted-first rule); stale names
    # no longer registered are dropped
    unlisted = [n for n in ENTRY_QUERIES if n not in set(_DRIVER_ROW_PRIORITY)]
    names = unlisted + [n for n in _DRIVER_ROW_PRIORITY if n in ENTRY_QUERIES]
    never = [n for n in names if n not in last_round]
    print(f"rounds seen: {rounds}")
    print(f"declared: {len(names)}  driver-row union: {len(last_round)}  never: {len(never)}")

    if len(never) >= 50:
        head = never[:50]
        rest = [n for n in names if n not in set(head)]
    else:
        refresh = sorted(
            (n for n in names if n in last_round),
            key=lambda n: (last_round[n], names.index(n)),
        )
        head = never + refresh[: 50 - len(never)]
        rest = [n for n in names if n not in set(head)]
    out = head + rest

    print("\nproposed window (first 50):")
    for n in head:
        tag = "NEVER" if n not in last_round else f"last r{last_round[n]}"
        print(f"  {n}  [{tag}]")
    if "--emit" in sys.argv:
        print("\n_DRIVER_ROW_PRIORITY = [")
        for n in out:
            print(f'    "{n}",')
        print("]")


if __name__ == "__main__":
    main()
