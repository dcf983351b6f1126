#!/usr/bin/env python3
"""Propose the next round's driver correctness window.

The external driver attests a ~50-entry prefix of ``queries()`` per
round; ``__spark_entry__._DRIVER_WINDOW`` decides which entries lead.
This tool makes the per-round rotation mechanical and auditable:

- ~20 relational queries, least-recently-windowed first (q01–q51
  rotate so the relational spine keeps accumulating fresh driver rows
  without monopolizing the window), then
- ~30 op_* entries that have NEVER been in any round's window
  (DRIVER_WINDOWS.json ledger), round-robined across operator
  families (first token after ``op_``) so one family can't crowd out
  the rest; falls back to least-recently-windowed op_* once the
  never-windowed pool is exhausted.

Prints the proposed python list literal (paste into
``__spark_entry__.py``) plus the ledger entry to add. Run the
pre-flight before committing:

    python scripts/check_correctness.py /root/testdata/sf0.01 <entries>

No Spark session needed — this only reads the registry import and the
ledger.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RELATIONAL = 20
N_OPS = 30


def _ledger() -> dict[str, list[str]]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DRIVER_WINDOWS.json")) as f:
        return {
            k: v for k, v in json.load(f).items() if k.startswith("r")
        }


def _last_windowed_round(ledger: dict[str, list[str]]) -> dict[str, int]:
    """entry -> newest round number it appeared in (0 = never)."""
    out: dict[str, int] = {}
    for rk, entries in ledger.items():
        rnum = int(rk[1:])
        for e in entries:
            out[e] = max(out.get(e, 0), rnum)
    return out


def _family(name: str) -> str:
    return name.split("_")[1] if name.startswith("op_") else "q"


def propose() -> tuple[list[str], int]:
    import __spark_entry__ as e

    all_entries = list(e.queries())
    ledger = _ledger()
    last = _last_windowed_round(ledger)
    next_round = max(int(k[1:]) for k in ledger) + 1

    rel = [n for n in all_entries if not n.startswith("op_")]
    ops = [n for n in all_entries if n.startswith("op_")]

    # relational: least-recently-windowed first, stable by name
    rel_pick = sorted(rel, key=lambda n: (last.get(n, 0), n))[:N_RELATIONAL]

    # ops: never-windowed first, round-robin across families
    never = [n for n in ops if last.get(n, 0) == 0]
    by_fam: dict[str, list[str]] = defaultdict(list)
    for n in sorted(never):
        by_fam[_family(n)].append(n)
    picked: list[str] = []
    fams = sorted(by_fam)
    while len(picked) < N_OPS and any(by_fam[f] for f in fams):
        for f in fams:
            if by_fam[f] and len(picked) < N_OPS:
                picked.append(by_fam[f].pop(0))
    if len(picked) < N_OPS:  # pool exhausted: least-recently-windowed
        rest = sorted(
            (n for n in ops if n not in picked),
            key=lambda n: (last.get(n, 0), n),
        )
        picked += rest[: N_OPS - len(picked)]
    return rel_pick + picked, next_round


def main() -> int:
    window, next_round = propose()
    print(f"# proposed _DRIVER_WINDOW for round {next_round} "
          f"({len(window)} entries):")
    print("_DRIVER_WINDOW: list[str] = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    print()
    print(f'# DRIVER_WINDOWS.json: add  "r{next_round}": '
          f"{json.dumps(window)}")
    print()
    print("# pre-flight:")
    print(
        "python scripts/check_correctness.py /root/testdata/sf0.01 "
        + " ".join(window)
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
