#!/bin/sh
# Local dry-run of .github/workflows/ci.yml's lint + smoke jobs —
# the same commands the runner executes, for environments without a
# GitHub runner (or `act`). The security workflow's Trivy image scan
# needs docker + network and is NOT mirrored here; build the image
# with `docker build .` and scan with trivy where those exist.
set -e
cd "$(dirname "$0")/.."

echo "== job: lint =="
./scripts/lint.sh

echo "== job: smoke =="
python3 -m pytest tests/test_bench_contract.py -q
python3 -m pytest tests/test_pipeline.py -q -k "jwt or jwks or auth or role"
python3 -c "import __spark_entry__, bench, airflow_spark"

echo "ci_local: lint + smoke green (full-tests job: python -m pytest tests/ -q)"
