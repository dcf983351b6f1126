#!/bin/sh
# Deployment smoke for environments WITHOUT a Docker daemon (CI
# sandboxes): exercises the exact wiring the container runs — the
# serve entrypoint (scheduler + control plane) over real HTTP — and
# then probes it with the same healthcheck.sh the image's HEALTHCHECK
# uses. With Docker available, prefer the real path:
#   docker compose build && docker compose up -d engine
set -e
cd "$(dirname "$0")/.."
python3 - <<'EOF'
import os
import subprocess
import sys

sys.path.insert(0, os.getcwd())
from airflow_spark.serve import build  # noqa: E402

spark, plane, scheduler, state = build()
server = plane.serve(host="127.0.0.1", port=0)
port = server.server_address[1]
print(f"serve entrypoint up on :{port}; probing with healthcheck.sh")
env = dict(os.environ, SPARK_GRAFT_API_PORT=str(port))
rc = subprocess.run(
    ["/bin/sh", "scripts/healthcheck.sh"], env=env
).returncode
server.shutdown()
if rc != 0:
    sys.exit(f"healthcheck failed (rc={rc})")
print("compose smoke OK: entrypoint serves, healthcheck passes")
EOF
