#!/bin/sh
# Local dry-run of .github/workflows/ci.yml's lint + smoke jobs —
# the same commands the runner executes, for environments without a
# GitHub runner (or `act`). The security workflow's Trivy image scan
# needs docker + network and is NOT mirrored here; build the image
# with `docker build .` and scan with trivy where those exist.
set -e
cd "$(dirname "$0")/.."

# --publish-dry-run mirrors .github/workflows/publish.yml's publish
# job: build the image (when docker exists) and print the tag set the
# workflow would push. Never pushes — same as the workflow's default
# (push only happens on the runner with PUBLISH_IMAGE=true).
if [ "${1:-}" = "--publish-dry-run" ]; then
    echo "== job: publish (dry run) =="
    owner="${GITHUB_REPOSITORY_OWNER:-local}"
    tag="${GIT_TAG:-$(git describe --tags --abbrev=0 2>/dev/null || echo v0.0.0-dev)}"
    date_tag="$(date +%Y.%m.%d)"
    echo "would push:"
    echo "  ghcr.io/${owner}/airflow-spark-engine:${tag}"
    echo "  ghcr.io/${owner}/airflow-spark-engine:latest"
    echo "  ghcr.io/${owner}/airflow-spark-engine:${date_tag}"
    if command -v docker >/dev/null 2>&1 && docker info >/dev/null 2>&1; then
        docker build -t "airflow-spark-engine:${tag}" .
        echo "publish dry run: image built, nothing pushed"
    else
        echo "publish dry run: docker daemon unavailable here; tag plan above"
    fi
    exit 0
fi

echo "== job: lint =="
./scripts/lint.sh

echo "== job: smoke =="
python3 -m pytest tests/test_bench_contract.py -q
python3 -m pytest tests/test_pipeline.py -q -k "jwt or jwks or auth or role"
python3 -c "import __spark_entry__, bench, airflow_spark"

echo "ci_local: lint + smoke green (full-tests job: python -m pytest tests/ -q)"
