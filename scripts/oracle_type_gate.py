#!/usr/bin/env python3
"""Oracle output-type gate: DESCRIBE every ``oracle_sql()`` entry in
DuckDB and fail on any output column typed HUGEINT / UHUGEINT /
DECIMAL.

Why: the repo-local harness normalizes cells type-blind
(``oracle.py:_norm_cell`` renders Python ints identically whatever
their width), but the external driver's fetch path is type-sensitive —
round 9's only red row (q27) was a bare ``sum(n_chars)`` that DuckDB
types as HUGEINT (int128) while Spark returns BIGINT, and the driver's
pandas/arrow path rendered it ``"64437.00"`` vs ``"64437"``. The
convention everywhere else is ``CAST(sum(...) AS BIGINT)`` (82 sites
in ``operators/registry.py``); this gate makes the convention
mechanical so no bare wide-integer or decimal aggregate ever reaches an
attested surface again. Same spirit as ``scripts/tie_audit.py`` for
round() ties — audit the *gate* format hazard class, not one instance.

DESCRIBE only binds/plans (never executes), so the whole 248-entry
registry gates in seconds even though some oracles embed WITH
RECURSIVE closures that would take minutes to run.

Usage: python scripts/oracle_type_gate.py [sf_dir]
Exit 0 = clean; exit 1 lists every (entry, column, type) offender.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# HUGEINT/DECIMAL are the observed failure class (q27); FLOAT/REAL
# (float32 renders fewer digits than Spark's DOUBLE through pandas),
# sub-int widths, unsigned ints, TIME and INTERVAL are banned
# pre-emptively — the round-10 census showed ZERO of any of these
# across all 873 output columns (BIGINT/DOUBLE/VARCHAR/BOOLEAN/
# INTEGER/TIMESTAMP/DATE only), so the ban can never fire on an
# existing oracle, only stop a new divergence-prone one.
BANNED = re.compile(
    r"\b(U?HUGEINT|DECIMAL|FLOAT|REAL|U?TINYINT|U?SMALLINT|UINTEGER"
    r"|UBIGINT|TIME|INTERVAL)\b",
    re.IGNORECASE,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # data-derived oracles (IVF centroid literals) bind against this sf
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)

    import __spark_entry__ as e
    from airflow_spark.oracle import duckdb_connection

    sqls = e.oracle_sql()
    con = duckdb_connection(sf_dir)
    offenders: list[tuple[str, str, str]] = []
    n_cols = 0
    for name in sorted(sqls):
        try:
            rows = con.execute(f"DESCRIBE {sqls[name]}").fetchall()
        except Exception as exc:  # noqa: BLE001 — a non-binding oracle is its own failure
            offenders.append((name, "<describe failed>", str(exc)[:120]))
            continue
        for col, typ, *_ in rows:
            n_cols += 1
            if BANNED.search(typ):
                offenders.append((name, col, typ))
    con.close()
    if offenders:
        for name, col, typ in offenders:
            print(f"ORACLE TYPE GATE: {name}.{col} is {typ} "
                  f"(cast to BIGINT/DOUBLE/VARCHAR/TIMESTAMP/DATE — "
                  f"the driver fetch renders this type differently "
                  f"than the engine's)",
                  file=sys.stderr)
        return 1
    print(f"oracle_type_gate: {len(sqls)} oracles / {n_cols} output "
          f"columns, 0 divergence-prone types")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
