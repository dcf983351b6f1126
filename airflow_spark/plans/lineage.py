"""Column-level lineage from the analyzed logical plan.

Answers "which SOURCE columns feed each output column" for any
DataFrame — the impact-analysis / audit primitive (GDPR "where does
this field flow", safe-to-drop checks, selective backfills) that
normally requires an external lineage service; here it is derived
directly from Catalyst's analyzed plan, so it is always in sync with
what actually runs.

Mechanics: ``queryExecution.analyzed.toJSON`` serializes the operator
tree (preorder, ``num-children``) with every expression flattened the
same way. Lineage needs only two relations extracted from that JSON:

- every ``Alias`` defines its exprId from the AttributeReferences in
  its expression subtree (Project / Aggregate / Window expressions);
- ``Generate`` (explode/posexplode/UDTF) defines its generatorOutput
  attrs from the generator's input attrs;
- ``Union`` equates each output attr with the same-position attr of
  every branch.

Everything else (Filter/Join/Sort/Limit/SubqueryAlias/...) passes
attributes through unchanged, which in exprId terms is the identity.
Resolution walks these edges from the plan's output attrs down to leaf
relation attrs (scan outputs).

Known limits (documented, not silent): attrs produced by ``Expand``
(cube/rollup grouping sets) and scalar-subquery internals resolve to
the nearest traceable attr, and source names are NOT table-qualified —
a self-join's two sides share names (disambiguate upstream with
aliases if needed).
"""

from __future__ import annotations

import json
from collections import defaultdict

from pyspark.sql import DataFrame

_ATTR = "org.apache.spark.sql.catalyst.expressions.AttributeReference"
_ALIAS = "org.apache.spark.sql.catalyst.expressions.Alias"


def _expr_lists(value):
    """Normalize a node field into a list of flattened expression lists
    (the JSON serializes one expression as list[dict] and expression
    collections as list[list[dict]])."""
    if not isinstance(value, list) or not value:
        return []
    if isinstance(value[0], dict) and "class" in value[0]:
        return [value]
    if (
        isinstance(value[0], list)
        and value[0]
        and isinstance(value[0][0], dict)
        and "class" in value[0][0]
    ):
        return value
    return []


def _eid(d: dict) -> tuple:
    e = d["exprId"]
    return (e["jvmId"], e["id"])


def _attr_ids(expr: list[dict]) -> list[tuple]:
    return [_eid(d) for d in expr if d.get("class") == _ATTR]


def _build(nodes: list[dict], i: int = 0):
    node = nodes[i]
    children = []
    j = i + 1
    for _ in range(int(node.get("num-children", 0))):
        child, j = _build(nodes, j)
        children.append(child)
    return (node, children), j


def _roots(expr_lists) -> list[tuple]:
    """Output attr ids contributed by expression roots (Alias or bare
    AttributeReference)."""
    out = []
    for expr in expr_lists:
        root = expr[0]
        if root.get("class") in (_ALIAS, _ATTR):
            out.append(_eid(root))
    return out


def _node_output(tree, deps) -> list[tuple]:
    """Attr ids a node emits; records Union positional equivalences
    into ``deps`` as it recurses."""
    node, children = tree
    cls = node["class"]
    if "output" in node and not children:
        return [_eid(d) for ex in _expr_lists(node["output"]) for d in ex[:1]]
    if cls.endswith(".Project"):
        return _roots(_expr_lists(node.get("projectList", [])))
    if cls.endswith(".Aggregate"):
        return _roots(_expr_lists(node.get("aggregateExpressions", [])))
    if cls.endswith(".Window"):
        return _node_output(children[0], deps) + _roots(
            _expr_lists(node.get("windowExpressions", []))
        )
    if cls.endswith(".Generate"):
        gen_out = [
            _eid(ex[0]) for ex in _expr_lists(node.get("generatorOutput", []))
        ]
        return _node_output(children[0], deps) + gen_out
    if cls.endswith(".Union"):
        branch_outs = [_node_output(c, deps) for c in children]
        first = branch_outs[0]
        for other in branch_outs[1:]:
            for a, b in zip(first, other):
                deps[a].add(b)
        return first
    if cls.endswith(".Join"):
        return [a for c in children for a in _node_output(c, deps)]
    if len(children) == 1:
        return _node_output(children[0], deps)
    return [a for c in children for a in _node_output(c, deps)]


def _plan_graph(df: DataFrame):
    nodes = json.loads(df._jdf.queryExecution().analyzed().toJSON())  # noqa: SLF001
    deps: dict[tuple, set[tuple]] = defaultdict(set)
    names: dict[tuple, str] = {}
    sources: set[tuple] = set()

    for node in nodes:
        for field, value in node.items():
            for expr in _expr_lists(value):
                for d in expr:
                    if d.get("class") == _ATTR:
                        names.setdefault(_eid(d), d["name"])
                root = expr[0]
                if root.get("class") == _ALIAS:
                    rid = _eid(root)
                    names.setdefault(rid, root["name"])
                    deps[rid].update(
                        i for i in _attr_ids(expr[1:]) if i != rid
                    )
        # leaf relations: their outputs are the lineage sources
        if not int(node.get("num-children", 0)) and "output" in node:
            for expr in _expr_lists(node["output"]):
                sources.add(_eid(expr[0]))
        # explode/posexplode/UDTF: generator outputs depend on the
        # generator's input attrs
        if node["class"].endswith(".Generate"):
            gen_in = [
                i
                for ex in _expr_lists(node.get("generator", []))
                for i in _attr_ids(ex)
            ]
            for ex in _expr_lists(node.get("generatorOutput", [])):
                deps[_eid(ex[0])].update(gen_in)

    # Union positional equivalences need the operator tree
    tree, _ = _build(nodes)
    _node_output(tree, deps)
    return deps, names, sources


def column_lineage(df: DataFrame) -> dict[str, list[str]]:
    """Map each output column of ``df`` to the sorted list of source
    (leaf-scan) column names it derives from. Pure driver-side plan
    analysis — nothing is executed."""
    deps, names, sources = _plan_graph(df)

    memo: dict[tuple, set[tuple]] = {}

    def resolve(eid: tuple, seen: frozenset = frozenset()) -> set[tuple]:
        if eid in memo:
            return memo[eid]
        if eid in seen:
            return set()
        if eid in sources or eid not in deps:
            return {eid}
        out: set[tuple] = set()
        for d in deps[eid]:
            out |= resolve(d, seen | {eid})
        memo[eid] = out
        return out

    out_attrs = df._jdf.queryExecution().analyzed().output()  # noqa: SLF001
    # duplicate output names (a join keeping both sides' 'id') MERGE
    # their source sets — overwriting would drop the first column's
    # lineage and make impact analysis miss real dependents
    result: dict[str, list[str]] = {}
    for i in range(out_attrs.size()):
        a = out_attrs.apply(i)
        eid = (str(a.exprId().jvmId()), a.exprId().id())
        srcs = {names.get(s, str(s[1])) for s in resolve(eid)}
        if a.name() in result:
            srcs |= set(result[a.name()])
        result[a.name()] = sorted(srcs)
    return result


def affected_columns(df: DataFrame, source_col: str) -> list[str]:
    """Inverse lineage: which output columns of ``df`` would change if
    ``source_col`` changed (impact analysis for a schema migration)."""
    return sorted(
        out
        for out, srcs in column_lineage(df).items()
        if source_col in srcs
    )
