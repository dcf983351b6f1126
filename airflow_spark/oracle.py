"""Local DuckDB oracle harness.

Mirrors the driver's t2 check: run a registry query in Spark (DataFrame
API) and its oracle SQL in DuckDB over the same parquet, then compare
row count + column names + an order-insensitive value hash.

Normalization (SURVEY.md §2.12 verified recipe):
- floats → ``%.2f`` (declared queries pre-round, this is belt+braces),
- timestamps → ``%Y-%m-%d %H:%M:%S`` (declared queries pre-truncate),
- dates → ISO, None → ``\\N``,
- columns sorted by name, rows sorted lexicographically.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLE_NAMES


def _norm_cell(v: object) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.2f}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (int, str)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def normalize_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    """Sort columns by name, normalize cells, sort rows → canonical form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    return cols, out


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    cols, lines = normalize_rows(columns, rows)
    h = hashlib.sha256()
    h.update(("\x1e".join(cols)).encode())
    for line in lines:
        h.update(b"\x1d")
        h.update(line.encode())
    return h.hexdigest()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register each parquet as a view; cast events.ts ns→µs to match
    the Spark catalog normalization."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        if name == "events":
            con.execute(
                f"CREATE VIEW events AS SELECT event_id, "
                f"cast(ts AS TIMESTAMP) AS ts, user_id, event_type, value, "
                f"props FROM read_parquet('{path}')"
            )
        else:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


# Local-harness memo for oracle sub-plans shared by several entries
# (e.g. the recursive dedup-closure prefix both collapse twins embed):
# (sf_dir, key) -> materialized pyarrow table. Only populated when a
# caller passes ``memo`` — the driver never does, it runs the
# self-contained oracle_sql() strings.
_MEMO_CACHE: dict[tuple[str, str], object] = {}


def compare(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    spark_df: DataFrame,
    sql: str,
    memo: tuple[str, str, str] | None = None,
) -> dict:
    """Run both sides, return a comparison record.

    ``memo`` = (key, materialize_sql, rewritten_sql): evaluate
    ``materialize_sql`` once per (sf_dir, key), register the cached
    result as the ``__memo`` view, and run ``rewritten_sql`` instead of
    ``sql``. The rewrite must be equivalent by construction (see
    registry.oracle_memo_plans) — it only exists to keep the local
    3-scale verify chain from recomputing an expensive shared prefix."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    con = duckdb_connection(sf_dir)
    try:
        if memo is not None:
            key, materialize_sql, rewritten_sql = memo
            cached = _MEMO_CACHE.get((sf_dir, key))
            if cached is None:
                cached = con.execute(materialize_sql).arrow()
                _MEMO_CACHE[(sf_dir, key)] = cached
            con.register("__memo", cached)
            sql = rewritten_sql
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    rec = {
        "query": name,
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "hash_match": value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows),
    }
    rec["ok"] = (
        rec["spark_rows"] == rec["duck_rows"]
        and rec["cols_match"]
        and rec["hash_match"]
    )
    return rec
