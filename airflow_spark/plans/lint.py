"""Plan linter: flag scale-killers in a DataFrame's physical plan.

`audit_plan` (plans/audit.py) measures plan properties; this turns them
into actionable findings with severities — the checks a reviewer runs
by hand before letting a query near 100 TB, automated:

- ``cartesian-product`` / ``bnl-join``: O(n·m) joins that melt at scale
  (usually a missing/non-equi join condition).
- ``single-partition-sort``: an ``Exchange SinglePartition`` feeding a
  Sort — a global window/order with no partition key; one straggler
  task sorts the world (the exact failure mode the sharded form of
  `packing.pack_sequences` exists to avoid).
- ``python-row-udf``: ``BatchEvalPython`` — row-at-a-time Python on the
  hot path (~10-100× slower than builtins / Arrow); prefer
  `pyspark.sql.functions` or a pandas UDF.
- ``unpushed-filter``: a Filter sitting directly on a parquet scan
  whose PushedFilters is empty — the predicate runs after IO instead
  of inside it (casts/UDFs on the filter column are typical causes).
- ``no-partial-agg``: an aggregate exchanging raw rows without a
  map-side partial step (rare — usually collect_list/collect_set or
  a distinct-on-expression shape).

Findings are advisory (a linter, not a gate): `lint_plan` returns a
list of dicts; `assert_clean` raises with the findings rendered, for
use in tests and `Pipeline.test` hooks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .audit import explain_str


def _finding(code: str, severity: str, advice: str, node: str = "") -> dict:
    return {"code": code, "severity": severity, "advice": advice, "node": node}


def lint_plan(df: DataFrame, execute: bool = False) -> list[dict]:
    """Inspect the (optionally AQE-finalized) physical plan and return
    scale findings, worst first. ``execute=True`` runs the query first
    so adaptive re-planning (broadcast promotion, skew splits) is what
    gets linted — cheap at test scale, and what actually ran."""
    if execute:
        df.collect()
    plan = explain_str(df)
    simple = explain_str(df, "simple")
    findings: list[dict] = []

    if "CartesianProduct" in plan:
        findings.append(
            _finding(
                "cartesian-product",
                "critical",
                "O(n*m) cross product: add an equi-join condition, or "
                "broadcast + bound one side explicitly if it is tiny.",
                "CartesianProduct",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            _finding(
                "bnl-join",
                "critical",
                "non-equi join nested-loops the broadcast side against "
                "every row: rewrite as an equi join on a derived key "
                "(bucketed range / interval bucketing) where possible.",
                "BroadcastNestedLoopJoin",
            )
        )
    # A Sort (or Window) whose child is Exchange SinglePartition = a
    # global sort/window: one task orders the entire input. Adjacency
    # matters — a global scalar aggregate also exchanges to a single
    # partition (legitimately: its input is already partially
    # aggregated to one row per task), so only flag when the single
    # partition feeds an ordering node. The simple-mode tree prints a
    # parent directly above its first child; orderBy+limit compiles to
    # TakeOrderedAndProject (no Sort node) and stays clean.
    simple_lines = simple.splitlines()
    single_part_sort = any(
        "Exchange SinglePartition" in ln
        and i > 0
        and re.search(r"\bSort\b|\bWindow\b", simple_lines[i - 1])
        for i, ln in enumerate(simple_lines)
    )
    if single_part_sort:
        findings.append(
            _finding(
                "single-partition-sort",
                "high",
                "global sort/window with no partition key: one straggler "
                "task sorts everything. Partition the window (or use "
                "repartitionByRange + sortWithinPartitions for output "
                "layout; orderBy+limit compiles to TakeOrderedAndProject "
                "and is fine).",
                "Exchange SinglePartition",
            )
        )
    if "BatchEvalPython" in plan:
        findings.append(
            _finding(
                "python-row-udf",
                "high",
                "row-at-a-time Python UDF on the executor path: use "
                "built-in pyspark.sql.functions, or an Arrow-batched "
                "pandas UDF if Python is unavoidable.",
                "BatchEvalPython",
            )
        )
    # Filters evaluated above parquet scans that pushed nothing useful:
    # parquet pushes IsNotNull for nearly any filter, so "unpushed"
    # means every scan's PushedFilters is empty or IsNotNull-only while
    # a Filter node still runs above — the predicate does IO it could
    # have skipped. (Requiring ALL scans weak avoids flagging unions /
    # joins where another scan did get the comparison pushed.)
    scan_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)

    def _weak(pushed: str) -> bool:
        stripped = re.sub(r"IsNotNull\([^)]*\)", "", pushed)
        return not stripped.strip(" ,")

    # ...and only when some Filter node carries a real predicate beyond
    # null-rejection (Catalyst adds bare isnotnull Filters above every
    # join-key scan; those ARE pushed and are not findings).
    def _residual_predicate() -> bool:
        for ln in simple.splitlines():
            m = re.search(r"\bFilter (.+)$", ln)
            if not m:
                continue
            cond = re.sub(r"isnotnull\([^)]*\)", "", m.group(1))
            cond = re.sub(r"\bAND\b|\bOR\b|[()\s]", "", cond)
            if cond:
                return True
        return False

    if scan_filters and all(_weak(s) for s in scan_filters) and _residual_predicate():
        findings.append(
            _finding(
                "unpushed-filter",
                "medium",
                "no parquet scan pushed more than IsNotNull while the "
                "plan filters rows above: expressions (cast, substring, "
                "arithmetic) on the filter column block pushdown — "
                "filter on the raw column, or materialize the derived "
                "column at write time.",
                "Scan parquet (IsNotNull-only PushedFilters)",
            )
        )
    # Aggregation with an exchange but a missing partial (map-side)
    # step. Per-NODE counting, not a plan-wide substring: one
    # partial-capable aggregate elsewhere must not mask a different
    # aggregate that shuffles raw rows. In simple mode every aggregate
    # node prints its functions inline, partial phases as
    # ``partial_<fn>`` — a plan whose final-phase node count exceeds
    # its partial-phase node count has at least one unpaired final.
    agg_nodes = re.findall(
        r"(?:HashAggregate|ObjectHashAggregate|SortAggregate)\([^\n]*",
        simple,
    )
    # only nodes that actually COMPUTE functions participate: the
    # function-less dedup phases of a distinct aggregate print
    # functions=[] and would otherwise count as unpaired finals
    working = [n for n in agg_nodes if re.search(r"functions=\[[^\]]", n)]
    n_partial_nodes = sum(1 for n in working if "partial_" in n)
    n_final_nodes = len(working) - n_partial_nodes
    if (
        agg_nodes
        and re.search(r"Exchange (?:hash|range)", simple + plan)
        and n_final_nodes > n_partial_nodes
    ):
        findings.append(
            _finding(
                "no-partial-agg",
                "medium",
                "aggregate shuffles raw rows without a map-side partial "
                "step: collect_list/collect_set and some distinct shapes "
                "do this — pre-aggregate or restructure if the groups "
                "are large.",
                "HashAggregate (no partial)",
            )
        )
    order = {"critical": 0, "high": 1, "medium": 2, "low": 3}
    findings.sort(key=lambda f: order.get(f["severity"], 9))
    return findings


def assert_clean(
    df: DataFrame,
    execute: bool = False,
    allow: set[str] | frozenset[str] = frozenset(),
) -> None:
    """Raise ``AssertionError`` listing any finding not in ``allow`` —
    the test-time gate form of the linter."""
    bad = [f for f in lint_plan(df, execute=execute) if f["code"] not in allow]
    if bad:
        lines = "\n".join(
            f"  [{f['severity']}] {f['code']}: {f['advice']}" for f in bad
        )
        raise AssertionError(f"plan lint findings:\n{lines}")
