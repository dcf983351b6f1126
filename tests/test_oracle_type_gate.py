"""The oracle output-type gate (scripts/oracle_type_gate.py): no
attested oracle may emit a column type the external harness's arrow
fetch renders differently than the engine's type — the q27 round-9
red row class (DuckDB HUGEINT vs Spark BIGINT)."""

import os
import sys

import duckdb

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)


def test_banned_regex_boundaries():
    from oracle_type_gate import BANNED

    # the observed failure class and the pre-emptive bans
    for typ in (
        "HUGEINT", "UHUGEINT", "DECIMAL(18,3)", "FLOAT", "REAL",
        "TINYINT", "SMALLINT", "UINTEGER", "UBIGINT", "TIME",
        "INTERVAL", "TIMESTAMP WITH TIME ZONE",
    ):
        assert BANNED.search(typ), typ

    # every type the 873-column census actually uses must pass
    for typ in (
        "BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "INTEGER",
        "TIMESTAMP", "DATE",
    ):
        assert not BANNED.search(typ), typ


def test_describe_catches_bare_integer_sum():
    """The exact q27 shape: DuckDB types a bare integer sum() as
    HUGEINT; the repo convention CAST(... AS BIGINT) passes."""
    from oracle_type_gate import BANNED

    con = duckdb.connect()
    con.execute("CREATE VIEW d AS SELECT 1 AS n, 'en' AS lang")

    def out_types(sql):
        return [t for _, t, *rest in con.execute(f"DESCRIBE {sql}").fetchall()]

    bare = out_types("SELECT lang, sum(n) AS s FROM d GROUP BY lang")
    assert any(BANNED.search(t) for t in bare)
    cast = out_types(
        "SELECT lang, CAST(sum(n) AS BIGINT) AS s FROM d GROUP BY lang"
    )
    assert not any(BANNED.search(t) for t in cast)
