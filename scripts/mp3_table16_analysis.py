#!/usr/bin/env python3
"""Reproduce the ADR 0001 table-16 exclusion analysis.

Big-values Huffman tables 16-23 (ISO/IEC 11172-3 Table B.7) share one
code table — table 16's. Its offline transcription attempt (kept here
verbatim) FAILS the Kraft + prefix-freeness validation that gated
every shipped table, and this script shows why no honest repair
exists either:

1. The transcription's Kraft sum is exactly 1 (lengths consistent)
   but 7 entries collide (duplicates / prefix clashes) — so some
   CODES are misremembered, lengths likely right.
2. Minimal-repair search: for every candidate "wrong set" of the form
   {4 conflict entries} + {1 more entry}, remove the set and test
   whether the freed leaf space of the binary code tree can be
   exactly covered by leaves at the removed entries' lengths.
   EXACTLY ONE candidate admits any completion — suspects
   {(13,15), (14,8), (14,9), (14,14), (12,14)} — and it admits
   EXACTLY ONE leaf cover. The tree repair is forced.
3. But two of those suspects share length 14, so the SYMBOL-to-leaf
   pairing is 2-way ambiguous: {(14,8), (14,14)} <-> {432, 438}.
   The only structural tie-breaker available — same-length codes
   descending within a row — is checked below against every shipped
   table and has exceptions (7 across 618 consecutive same-length
   pairs at last count), so it is a tendency, not a law.

A wrong pairing would silently swap two decoded (x, y) symbols on
foreign streams, which is exactly the failure mode the strict decode
contract exists to prevent — so tables 16-23 stay excluded and raise
``Mp3DecodeError`` (see docs/adr/0001-mp3-decode-boundary.md).

Run: python scripts/mp3_table16_analysis.py   (~2 min)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The failed transcription attempt (hlen / hcod grids), kept verbatim
#: so the analysis is reproducible. NOT importable by the decoder.
T16_LENS = [
    [1, 4, 6, 8, 9, 9, 10, 10, 11, 11, 11, 12, 12, 12, 13, 9],
    [3, 4, 6, 7, 8, 9, 9, 9, 10, 10, 10, 11, 12, 11, 12, 8],
    [6, 6, 7, 8, 9, 9, 10, 10, 11, 10, 11, 11, 11, 12, 12, 9],
    [8, 7, 8, 9, 9, 10, 10, 10, 11, 11, 12, 12, 12, 13, 13, 10],
    [9, 8, 9, 9, 10, 10, 11, 11, 11, 12, 12, 12, 13, 13, 13, 9],
    [9, 8, 9, 9, 10, 11, 11, 12, 11, 12, 12, 13, 13, 13, 14, 10],
    [10, 9, 9, 10, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 14, 10],
    [10, 9, 10, 10, 11, 11, 11, 12, 12, 13, 13, 13, 13, 15, 15, 10],
    [10, 10, 10, 11, 11, 11, 12, 12, 13, 13, 13, 13, 14, 14, 14, 10],
    [11, 10, 10, 11, 11, 12, 12, 13, 13, 13, 13, 14, 13, 14, 13, 11],
    [11, 11, 10, 11, 12, 12, 12, 12, 13, 14, 14, 14, 15, 15, 14, 10],
    [12, 11, 11, 11, 12, 12, 13, 14, 14, 14, 14, 14, 14, 13, 14, 11],
    [12, 12, 12, 12, 12, 13, 13, 13, 13, 15, 14, 14, 14, 14, 16, 11],
    [14, 12, 12, 12, 13, 13, 14, 14, 14, 16, 16, 14, 16, 16, 16, 11],
    [13, 13, 11, 12, 14, 14, 13, 14, 14, 15, 16, 15, 16, 15, 14, 11],
    [9, 8, 8, 9, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 11, 8],
]
T16_CODS = [
    [1, 5, 14, 44, 74, 63, 110, 93, 172, 149, 138, 242, 225, 195, 376, 17],
    [3, 4, 12, 20, 35, 62, 53, 47, 83, 75, 68, 119, 201, 107, 207, 9],
    [15, 13, 23, 38, 67, 58, 103, 90, 161, 72, 127, 117, 110, 209, 206, 16],
    [45, 21, 39, 69, 64, 114, 99, 87, 158, 140, 252, 212, 199, 387, 365, 26],
    [75, 36, 68, 65, 115, 101, 179, 164, 155, 264, 246, 226, 395, 382, 362,
     9],
    [66, 30, 59, 56, 102, 185, 173, 265, 142, 253, 232, 400, 388, 378, 445,
     16],
    [111, 54, 52, 100, 184, 178, 160, 133, 257, 244, 228, 217, 385, 366,
     715, 10],
    [98, 48, 91, 88, 165, 157, 148, 261, 248, 407, 397, 372, 380, 889, 884,
     8],
    [85, 84, 81, 159, 156, 143, 260, 249, 427, 401, 392, 383, 727, 713,
     708, 7],
    [154, 76, 73, 141, 131, 256, 245, 426, 406, 394, 384, 735, 359, 710,
     352, 11],
    [139, 129, 67, 125, 247, 233, 229, 219, 393, 743, 737, 720, 885, 882,
     439, 4],
    [243, 120, 118, 115, 227, 223, 396, 746, 742, 736, 721, 712, 706, 223,
     436, 6],
    [202, 224, 222, 218, 216, 389, 386, 381, 364, 888, 443, 707, 440, 437,
     1728, 4],
    [747, 211, 210, 208, 370, 379, 734, 723, 714, 1735, 1737, 709, 1734,
     1736, 1739, 4],
    [377, 369, 102, 187, 726, 722, 358, 711, 709, 866, 1738, 871, 1733,
     870, 434, 0],
    [12, 10, 7, 11, 10, 17, 11, 9, 13, 12, 10, 7, 5, 3, 1, 3],
]

#: the 4 entries involved in duplicate/prefix validation conflicts
BASE_SUSPECTS = [(13, 15), (14, 8), (14, 9), (14, 14)]


def validate():
    """Step 1: show the transcription fails validation (Kraft == 1,
    but collisions exist)."""
    # list of symbols per codeword, so duplicate AND prefix findings
    # name EVERY (x, y) involved — a single-slot dict would keep only
    # the last-seen symbol and mislabel which entries conflict
    codes: dict[str, list[tuple[int, int]]] = {}
    kraft = 0.0
    errs = []
    for x in range(16):
        for y in range(16):
            ln, cd = T16_LENS[x][y], T16_CODS[x][y]
            bits = format(cd, f"0{ln}b")
            if bits in codes:
                errs.append(
                    f"duplicate {bits}: {codes[bits] + [(x, y)]}"
                )
            codes.setdefault(bits, []).append((x, y))
            kraft += 2.0 ** -ln
    keys = sorted(codes)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            if b.startswith(a):
                errs.append(f"prefix {a}={codes[a]} of {b}={codes[b]}")
    return kraft, errs


def _free_subtrees(assigned: set[str]) -> list[str]:
    """Maximal uncovered subtrees of the binary code tree."""
    free: list[str] = []

    def walk(prefix: str, depth: int) -> None:
        if depth > 19 or prefix in assigned:
            return
        if any(prefix.startswith(a) for a in assigned if a != prefix):
            return
        if not any(a.startswith(prefix) for a in assigned):
            free.append(prefix)
            return
        walk(prefix + "0", depth + 1)
        walk(prefix + "1", depth + 1)

    walk("0", 1)
    walk("1", 1)
    return free


def try_suspects(suspects: set) -> list[tuple]:
    """Exact covers of the freed leaf space with leaves at the
    suspects' recalled lengths; [] when the fixed part conflicts or
    the masses mismatch."""
    assigned: dict[str, tuple[int, int]] = {}
    for x in range(16):
        for y in range(16):
            if (x, y) in suspects:
                continue
            bits = format(T16_CODS[x][y], f"0{T16_LENS[x][y]}b")
            if bits in assigned:
                return []
            assigned[bits] = (x, y)
    keys = sorted(assigned)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            if b.startswith(a):
                return []
    free = _free_subtrees(set(assigned))
    need = sorted(T16_LENS[x][y] for x, y in suspects)
    if abs(sum(2.0 ** -len(f) for f in free)
           - sum(2.0 ** -n for n in need)) > 1e-12:
        return []
    sols: list[tuple] = []

    def cover(subtrees: list[str], lens_left: list[int], chosen: list[str]):
        if len(sols) > 3:
            return
        if not subtrees:
            if not lens_left:
                sols.append(tuple(sorted(chosen)))
            return
        st = subtrees[0]
        for ln in sorted(set(lens_left)):
            if ln < len(st):
                continue
            leaf = st + "0" * (ln - len(st))
            rest, cur = [], leaf
            while len(cur) > len(st):
                rest.append(cur[:-1] + ("1" if cur[-1] == "0" else "0"))
                cur = cur[:-1]
            nl = list(lens_left)
            nl.remove(ln)
            cover(sorted(rest) + subtrees[1:], nl, chosen + [leaf])

    cover(sorted(free), need, [])
    return sols


def descending_invariant_exceptions():
    """Step 3: the would-be tie-breaker, checked against every SHIPPED
    table: within a row, does each same-length code strictly descend
    vs the previous same-length code? Returns (n_pairs, exceptions)."""
    from airflow_spark.operators.mp3 import _HUFF_BV_COD, _HUFF_BV_LEN

    n_pairs, exceptions = 0, []
    for t in sorted(_HUFF_BV_LEN):
        lens, cods = _HUFF_BV_LEN[t], _HUFF_BV_COD[t]
        for x in range(len(lens)):
            last: dict[int, int] = {}
            for y in range(len(lens)):
                ln = lens[x][y]
                if ln in last:
                    n_pairs += 1
                    if cods[x][y] >= last[ln]:
                        exceptions.append((t, x, y))
                last[ln] = cods[x][y]
    return n_pairs, exceptions


def main() -> int:
    kraft, errs = validate()
    print(f"step 1 — validation: kraft={kraft:.6f}, "
          f"{len(errs)} collisions (expected 7):")
    for e in errs:
        print("   ", e)

    print("\nstep 2 — minimal-repair search "
          "(BASE 4 conflicts + every possible 5th suspect):")
    hits = []
    for x in range(16):
        for y in range(16):
            if (x, y) in BASE_SUSPECTS:
                continue
            sols = try_suspects(set(BASE_SUSPECTS) | {(x, y)})
            if sols:
                hits.append(((x, y), sols))
    for extra, sols in hits:
        print(f"    5th suspect {extra}: {len(sols)} exact cover(s)")
        for s in sols:
            print("       leaves:", s)
    print(f"    -> {len(hits)} candidate repair(s) admit any completion")

    print("\nstep 3 — tie-breaker audit (same-length descending rows "
          "across shipped tables):")
    n_pairs, exc = descending_invariant_exceptions()
    print(f"    {len(exc)} exceptions in {n_pairs} pairs: {exc}")

    forced = len(hits) == 1 and len(hits[0][1]) == 1
    print(
        "\nconclusion: tree repair "
        + ("IS uniquely forced" if forced else "is NOT unique")
        + ", but the two len-14 suspects make the symbol pairing 2-way"
        "\nambiguous and the descending tendency above is not "
        "exception-free —\nno honest reconstruction: tables 16-23 stay "
        "excluded (ADR 0001)."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
