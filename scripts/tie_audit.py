#!/usr/bin/env python3
"""Rounding-tie distance audit over every oracle's rounded-double
columns — the class fix for the r7 op_cusum and r8 op_holt_forecast
driver hash flakes.

Mechanism being audited: the correctness hash formats doubles with
``%.2f`` after the query's own ``round(x, d)``. Engine builds compute
``round(x, d)`` differently at a d-decimal HALF tie (BigDecimal
HALF_UP vs scaled-rint), so a pre-round value sitting within ~1e-9 of
``*.…5`` can round to values 10^-d apart on the two engines — and the
hash flips iff those two candidates format differently under
``%.2f``. Both conditions are measurable from the ORACLE side alone
(cross-engine divergence of the pre-round value itself is ulp-scale,
far below the flag threshold).

For each oracle SQL this script:
  1. finds every terminal ``round(EXPR, d) AS alias`` call (balanced-
     paren scan; nested/unaliased calls are reported as unaudited),
  2. re-runs the query with those calls replaced by raw
     ``CAST(EXPR AS DOUBLE)``,
  3. per column computes the scaled tie distance
     ``|frac(|x|·10^d) − 0.5|`` and, for near-tie values, whether the
     two round candidates straddle a %.2f boundary (a real hazard).

Output: TIE_AUDIT.json with per-op per-column minimum distances and a
``hazards`` list that verify_all.sh fails on. Usage:

    python scripts/tie_audit.py [sf_dir ...]   # default: all 3 sfs

Analyzed residual classes the generic audit does not cover (verified
manually, round 9):
- round() as a GROUP/ORDER key: op_mode / op_window_funcs2 /
  op_topk_with_ties use d=0 on raw or single-division doubles (no
  scaling step — both engines round half away from zero on the SAME
  double, deterministic); op_abc_class / q48 order by round(sum of
  cents data, 2), whose true value is an exact cents multiple, so the
  scaled product is ulps from an integer, never near a tie.
- CASE/WHERE thresholds on unrounded quotients: op_abc_class's
  0.8/0.95 class bounds and op_zscore_anomalies' |z| >= 3.0 gate were
  measured at all 3 sfs — minimum data distance 6.4e-6 vs cross-engine
  quotient divergence ~1e-13 (zscore: nearest |z| is 3 rounding steps
  from the gate), margin >= 1e7.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# values whose scaled distance from the .5 rounding tie is below this
# are "near-tie": a different round() implementation could legitimately
# resolve them the other way (covers ~1e-9-in-value-units divergence
# for d<=6 columns with generous margin)
NEAR_TIE_SCALED = 1e-4

# values sitting machine-exactly ON the .5 tie (dist below this) are a
# hazard REGARDLESS of the %.2f-straddle heuristic: the two round()
# candidates differ in the d-th decimal, and any consumer that hashes
# at finer granularity than %.2f (the external driver's normalization
# is not ours to assume) flips on them. This closed the r10 blind spot:
# op_rolling_stats.roll_mean had min_scaled_dist 0.0 at sf0.01 yet
# n_hazards 0, and the driver's hash diverged exactly there.
EXACT_TIE_SCALED = 1e-9


def find_round_calls(sql: str) -> list[tuple[int, int, str, int]]:
    """All ``round(EXPR, <int literal>)`` call spans in ``sql``:
    (start, end_exclusive, expr_text, decimals). Inner calls nested in
    a found call's span are not re-reported (the caller replaces the
    whole outer span)."""
    calls = []
    low = sql.lower()
    i = 0
    while True:
        j = low.find("round(", i)
        if j == -1:
            break
        if j > 0 and (low[j - 1].isalnum() or low[j - 1] == "_"):
            i = j + 6
            continue
        depth = 0
        k = j + 5  # index of '('
        top_commas = []
        k2 = k
        while k2 < len(sql):
            c = sql[k2]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1:
                top_commas.append(k2)
            k2 += 1
        end = k2
        if len(top_commas) == 1:
            expr = sql[k + 1 : top_commas[0]].strip()
            dtxt = sql[top_commas[0] + 1 : end].strip()
            if re.fullmatch(r"-?\d+", dtxt):
                calls.append((j, end + 1, expr, int(dtxt)))
            else:
                # non-literal decimals: can't audit, but MUST be
                # visible in the report (decimals=None sentinel)
                calls.append((j, end + 1, expr, None))
        elif not top_commas:
            # single-argument round(x) == round(x, 0) — same tie class
            calls.append((j, end + 1, sql[k + 1 : end].strip(), 0))
        i = end + 1
    return calls


_ALIAS_RE = re.compile(r"^\s*(\+\s*0(\.0)?\s+)?AS\s+(\w+)", re.IGNORECASE)
# `round(...) AS BIGINT)` is a CAST target, not an output alias
_TYPE_WORDS = {
    "bigint", "double", "int", "integer", "float", "real", "decimal",
    "varchar", "text", "date", "timestamp", "boolean", "smallint",
}


_KW_RE = re.compile(
    r"\b(select|from|where|group|order|limit|having|window)\b", re.IGNORECASE
)


def _final_select_span(sql: str) -> tuple[int, int] | None:
    """(start, end) of the final top-level SELECT list, or None when
    the shape is unsafe to append to (top-level UNION branches, or a
    DISTINCT select list whose row set an extra column would change)."""
    depth = 0
    selects: list[int] = []
    boundaries: list[tuple[int, str]] = []
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and (c.isalpha()):
            m = _KW_RE.match(sql, i)
            if m:
                kw = m.group(1).lower()
                if kw == "select":
                    selects.append(m.end())
                else:
                    boundaries.append((m.start(), kw))
                i = m.end()
                continue
        i += 1
    if len(selects) != 1:
        return None  # 0 or UNION branches — ambiguous append target
    start = selects[0]
    if re.match(r"\s*distinct\b", sql[start:], re.IGNORECASE):
        return None
    end = len(sql)
    for pos, _kw in boundaries:
        if pos > start:
            end = pos
            break
    return start, end


def _dist_expr(expr: str, d: int) -> str:
    scale = f"{10.0 ** d!r}"
    v = f"abs(CAST(({expr}) AS DOUBLE)) * {scale}"
    return f"abs({v} - floor({v}) - 0.5)"


def rewrite(
    sql: str,
) -> tuple[str, dict[str, int], list[tuple[str, int]], list[str]]:
    """Audit rewrite of one oracle query.

    Aliased terminal ``round(EXPR, d) AS alias`` calls are replaced by
    raw ``CAST(EXPR AS DOUBLE)`` (pre-round values, analyzed for
    near-tie + format-flip hazards). Nested round calls inside the
    final top-level select list get an appended ``__tie{i}`` distance
    probe column (reported as warns — their downstream use is unknown,
    so a format-flip check can't clear them). Everything else is noted.

    Returns (audited_sql, {alias: decimals}, [(probe_col, decimals)],
    notes)."""
    calls = find_round_calls(sql)
    span = _final_select_span(sql)
    audited: dict[str, int] = {}
    probes: list[tuple[str, int]] = []
    notes: list[str] = []
    edits: list[tuple[int, int, str]] = []  # (start, end, replacement)
    appends: list[str] = []
    for start, end, expr, d in calls:
        if d is None:
            notes.append(
                f"non-literal decimals round(...) at char {start} — "
                "cannot audit"
            )
            continue
        in_final = span is not None and span[0] <= start < span[1]
        m = _ALIAS_RE.match(sql[end:])
        if m and m.group(3).lower() not in _TYPE_WORDS:
            alias = m.group(3)
            if alias in audited and audited[alias] != d:
                notes.append(f"alias {alias} reused with different decimals")
                continue
            audited[alias] = d
            edits.append((start, end, f"CAST(({expr}) AS DOUBLE)"))
            if not in_final:
                # a CTE-internal round feeding downstream logic: the
                # replacement measures the pre-round values but the
                # audited query's downstream sees UNROUNDED values, so
                # the measured population is approximate — say so
                notes.append(
                    f"replaced CTE-internal round(..., {d}) AS {alias}"
                    " — audited population approximate"
                )
        elif in_final:
            col = f"__tie{len(probes)}"
            probes.append((col, d))
            appends.append(f", {_dist_expr(expr, d)} AS {col}")
        else:
            notes.append(f"nested/unaliased round(..., {d}) at char {start}")
    if appends:
        edits.append((span[1], span[1], " " + "".join(appends) + " "))
    out = sql
    for start, end, repl in sorted(edits, reverse=True):
        out = out[:start] + repl + out[end:]
    return out, audited, probes, notes


def fmt2(v: float) -> str:
    return f"{v:.2f}"


def analyze(values: list, d: int) -> dict:
    """Tie metrics for one column's pre-round values at ``d`` decimals."""
    scale = 10.0**d
    min_dist = None
    n_near = 0
    hazards = []
    for v in values:
        if v is None or not isinstance(v, float) or math.isnan(v) or math.isinf(v):
            continue
        s = abs(v) * scale
        if s > 2**52:  # frac not resolvable; also far beyond any tie
            continue
        dist = abs(s - math.floor(s) - 0.5)
        if min_dist is None or dist < min_dist:
            min_dist = dist
        if dist < NEAR_TIE_SCALED:
            n_near += 1
            sign = -1.0 if v < 0 else 1.0
            lo = sign * math.floor(s) / scale
            hi = sign * (math.floor(s) + 1) / scale
            # exact ties are hazards unconditionally (see EXACT_TIE_SCALED)
            if dist < EXACT_TIE_SCALED or fmt2(lo) != fmt2(hi):
                hazards.append(v)
    return {
        "min_scaled_dist": min_dist,
        "n_near_tie": n_near,
        "hazard_values": hazards[:5],
        "n_hazards": len(hazards),
    }


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dirs[0])

    import __spark_entry__ as e
    from airflow_spark import oracle
    from airflow_spark.operators.registry import oracle_memo_plans

    sqls = e.oracle_sql()
    memos = oracle_memo_plans()
    report: dict = {
        "near_tie_scaled": NEAR_TIE_SCALED,
        "ops": {},
        "hazards": [],
        "warns": [],
    }

    for sf_dir in sf_dirs:
        sf = os.path.basename(sf_dir.rstrip("/"))
        con = oracle.duckdb_connection(sf_dir)
        memo_done: set[str] = set()
        memo_sqls: dict[str, str] = {}
        try:
            audit_list = list(sorted(sqls))
            for name in audit_list:
                if name.startswith("__memo:"):
                    sql = memo_sqls[name]
                elif name in memos:
                    key, mat_sql, rew_sql = memos[name]
                    if key not in memo_done:
                        con.register("__memo", con.execute(mat_sql).arrow())
                        memo_done.add(key)
                        # rounds hidden inside the materialization (the
                        # rewrite selects pre-rounded memo columns) keep
                        # audit coverage via a pseudo-entry
                        pseudo = f"__memo:{key}"
                        memo_sqls[pseudo] = mat_sql
                        audit_list.append(pseudo)
                    sql = rew_sql
                else:
                    sql = sqls[name]
                audited_sql, aliases, probes, notes = rewrite(sql)
                ent = report["ops"].setdefault(
                    name, {"columns": {}, "unaudited": notes}
                )
                if not aliases and not probes:
                    continue
                try:
                    res = con.execute(audited_sql)
                    cols = [c[0] for c in res.description]
                    rows = res.fetchall()
                except Exception as exc:  # noqa: BLE001 — report, don't die
                    ent["unaudited"].append(f"{sf}: audited SQL failed: {exc}")
                    continue
                for alias, d in aliases.items():
                    if alias not in cols:
                        ent["unaudited"].append(f"{sf}: alias {alias} not in output")
                        continue
                    idx = cols.index(alias)
                    a = analyze([r[idx] for r in rows], d)
                    ent["columns"].setdefault(alias, {"decimals": d})[sf] = a
                    if a["n_hazards"]:
                        report["hazards"].append(
                            {"op": name, "col": alias, "sf": sf, **a}
                        )
                for col, d in probes:
                    if col not in cols:
                        continue
                    dists = [
                        r[cols.index(col)]
                        for r in rows
                        if r[cols.index(col)] is not None
                    ]
                    min_d = min(dists, default=None)
                    n_near = sum(1 for x in dists if x < NEAR_TIE_SCALED)
                    ent["columns"].setdefault(
                        col, {"decimals": d, "probe": True}
                    )[sf] = {"min_scaled_dist": min_d, "n_near_tie": n_near}
                    if n_near:
                        report["warns"].append(
                            {
                                "op": name,
                                "col": col,
                                "sf": sf,
                                "min_scaled_dist": min_d,
                                "n_near_tie": n_near,
                            }
                        )
        finally:
            con.close()
        print(f"{sf}: audited", file=sys.stderr)

    # rewrite() notes are static per-op but can surface once per SQL
    # occurrence / per scale pass — dedupe (order-preserving) so each
    # distinct note appears once in the report
    for v in report["ops"].values():
        v["unaudited"] = list(dict.fromkeys(v["unaudited"]))

    n_cols = sum(len(v["columns"]) for v in report["ops"].values())
    report["n_ops_with_rounds"] = sum(
        1 for v in report["ops"].values() if v["columns"]
    )
    report["n_columns_audited"] = n_cols
    json.dump(report, sys.stdout, indent=1, default=float)
    print()
    print(
        f"tie_audit: {report['n_ops_with_rounds']} ops / {n_cols} columns, "
        f"{len(report['hazards'])} hazards, {len(report['warns'])} warns",
        file=sys.stderr,
    )
    return 1 if report["hazards"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
