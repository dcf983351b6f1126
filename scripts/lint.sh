#!/bin/sh
# Lint gate — parity with the reference deployment's lint.sh (ruff
# check gating deploy; see .github/workflows there). Uses real ruff
# when installed (ruff.toml at the repo root); otherwise runs the
# bundled zero-dependency fallback implementing the same core rules.
set -e
cd "$(dirname "$0")/.."
if command -v ruff >/dev/null 2>&1; then
    ruff check airflow_spark tests scripts bench.py __spark_entry__.py
else
    echo "ruff not installed; running bundled fallback linter" >&2
    python3 scripts/lint_fallback.py
fi
