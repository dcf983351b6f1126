#!/usr/bin/env python3
"""Bundled fallback linter: the deploy gate must run in environments
where ruff isn't installable (this container). Implements the
highest-signal subset of the reference's `ruff check` gate as pure
stdlib AST/text checks:

  F401  unused import                E711  comparison to None with ==/!=
  E722  bare except                  F541  f-string without placeholders
  B006  mutable default argument     E501  line too long (> 99)
  W291/W293 trailing whitespace      W191  tabs in indentation
  E999  syntax error (ast.parse)

Zero dependencies, deterministic, exit 1 on any finding. `scripts/
lint.sh` prefers real ruff when present (same file set, ruff.toml).
"""

from __future__ import annotations

import ast
import os
import sys

MAX_LINE = 99

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def target_files() -> list[str]:
    out = []
    for top in ("airflow_spark", "tests", "scripts"):
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, top)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            out.extend(
                os.path.join(dirpath, f)
                for f in filenames
                if f.endswith(".py")
            )
    out.extend(
        os.path.join(ROOT, f)
        for f in ("bench.py", "__spark_entry__.py")
        if os.path.exists(os.path.join(ROOT, f))
    )
    return sorted(out)


class _ImportTracker(ast.NodeVisitor):
    """Collect imported names and every Name/Attribute root used."""

    def __init__(self) -> None:
        self.imports: dict[str, tuple[int, str]] = {}
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports[name] = (node.lineno, a.name)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            name = a.asname or a.name
            self.imports[name] = (node.lineno, a.name)

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)


def _ast_findings(path: str, tree: ast.AST, src: str) -> list[tuple[int, str, str]]:
    finds: list[tuple[int, str, str]] = []

    tracker = _ImportTracker()
    if os.path.basename(path) == "__init__.py":
        return finds  # re-export surface: F401 doesn't apply (ruff per-file-ignores)
    tracker.visit(tree)
    # names referenced inside string annotations / __all__ count as used
    for s in ast.walk(tree):
        if isinstance(s, ast.Constant) and isinstance(s.value, str):
            tracker.used.update(
                t for t in s.value.replace(".", " ").split() if t.isidentifier()
            )
    for name, (lineno, full) in tracker.imports.items():
        if name not in tracker.used:
            finds.append((lineno, "F401", f"unused import `{full}`"))

    # format specs (f"{x:.2f}") are themselves JoinedStr nodes — never
    # F541 candidates
    spec_ids = {
        id(n.format_spec)
        for n in ast.walk(tree)
        if isinstance(n, ast.FormattedValue) and n.format_spec is not None
    }
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            finds.append((node.lineno, "E722", "bare `except:`"))
        if isinstance(node, ast.Compare):
            for op, comp in zip(node.ops, node.comparators):
                if (
                    isinstance(op, (ast.Eq, ast.NotEq))
                    and isinstance(comp, ast.Constant)
                    and comp.value is None
                ):
                    finds.append(
                        (node.lineno, "E711", "comparison to None with ==/!=")
                    )
        if (
            isinstance(node, ast.JoinedStr)
            and id(node) not in spec_ids
            and not any(
                isinstance(v, ast.FormattedValue) for v in node.values
            )
        ):
            finds.append((node.lineno, "F541", "f-string without placeholders"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    finds.append(
                        (
                            default.lineno,
                            "B006",
                            f"mutable default argument in `{node.name}`",
                        )
                    )
    return finds


def _text_findings(path: str, src: str) -> list[tuple[int, str, str]]:
    finds = []
    for i, line in enumerate(src.splitlines(), 1):
        stripped = line.rstrip("\n")
        if len(stripped) > MAX_LINE:
            finds.append(
                (i, "E501", f"line too long ({len(stripped)} > {MAX_LINE})")
            )
        if stripped != stripped.rstrip():
            finds.append((i, "W291", "trailing whitespace"))
        indent = stripped[: len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            finds.append((i, "W191", "tab in indentation"))
    return finds


def main() -> int:
    n = 0
    for path in target_files():
        with open(path, encoding="utf-8") as f:
            src = f.read()
        rel = os.path.relpath(path, ROOT)
        try:
            tree = ast.parse(src, filename=path)
        except SyntaxError as exc:
            print(f"{rel}:{exc.lineno}: E999 syntax error: {exc.msg}")
            n += 1
            continue
        lines = src.splitlines()
        finds = [
            f
            for f in _ast_findings(path, tree, src) + _text_findings(path, src)
            if not (
                0 < f[0] <= len(lines) and "# noqa" in lines[f[0] - 1]
            )
        ]
        for lineno, code, msg in sorted(finds):
            print(f"{rel}:{lineno}: {code} {msg}")
        n += len(finds)
    if n:
        print(f"\n{n} finding(s)")
        return 1
    print(f"lint clean: {len(target_files())} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
