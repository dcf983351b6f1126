#!/bin/sh
# Container healthcheck — same probe shape as the reference's
# config/healthcheck.sh (poll the monitor endpoint, fail non-healthy).
# Python instead of curl+jq: the engine image already has python3 and
# this keeps the image slim. /health is intentionally unauthenticated.
PORT="${SPARK_GRAFT_API_PORT:-8080}"
exec python3 - "$PORT" <<'EOF'
import json
import sys
import urllib.request

port = sys.argv[1]
try:
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/health", timeout=10
    ) as r:
        body = json.load(r)
except Exception as exc:
    print(f"health endpoint unreachable: {exc}")
    sys.exit(1)
spark = body.get("spark", {}).get("status")
if spark != "healthy":
    print(f"spark unhealthy: {body.get('spark')}")
    sys.exit(1)
sched = body.get("scheduler", {}).get("status")
if sched not in ("healthy", "not_configured"):
    print(f"scheduler unhealthy: {body.get('scheduler')}")
    sys.exit(1)
print("healthy")
EOF
