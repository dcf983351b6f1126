#!/bin/sh
# Deployment smoke for environments WITHOUT a Docker daemon (CI
# sandboxes): exercises the exact wiring the container runs — the
# serve entrypoint (scheduler + control plane) over real HTTP — and
# then probes it with the same healthcheck.sh the image's HEALTHCHECK
# uses, followed by a dataset-trigger + deferrable-sensor drive into
# the state store (the triggerer-analog path a deployment exercises
# first). With Docker available, prefer the real path:
#   docker compose build && docker compose up -d engine
set -e
cd "$(dirname "$0")/.."
python3 - <<'EOF'
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.getcwd())
from airflow_spark.serve import build  # noqa: E402

state_dir = tempfile.mkdtemp(prefix="smoke-state-")
os.environ["SPARK_GRAFT_STATE_DIR"] = state_dir
spark, plane, scheduler, state = build()
assert state is not None, "state store must come up from the env wiring"
server = plane.serve(host="127.0.0.1", port=0)
port = server.server_address[1]
print(f"serve entrypoint up on :{port}; probing with healthcheck.sh")
env = dict(os.environ, SPARK_GRAFT_API_PORT=str(port))
rc = subprocess.run(
    ["/bin/sh", "scripts/healthcheck.sh"], env=env
).returncode
if rc != 0:
    server.shutdown()
    sys.exit(f"healthcheck failed (rc={rc})")

# -- dataset trigger + deferrable sensor, inside the served wiring ----------
# An upstream push lands in `watched`; the DatasetTrigger fires the
# pipeline; its deferrable sensor PARKS (max_parallel_tasks=1 — the
# single worker slot stays free) until a task writes the parquet the
# sensor waits for; the finished run must reach the state store.
import threading
import time

from airflow_spark.pipeline import Pipeline  # noqa: E402
from airflow_spark.pipeline.sensors import (  # noqa: E402
    DatasetTrigger,
    path_sensor,
)

watched = tempfile.mkdtemp(prefix="smoke-dataset-")
awaited = os.path.join(tempfile.mkdtemp(prefix="smoke-await-"), "t.parquet")

p = Pipeline("smoke_triggered", max_parallel_tasks=1)
p.sensor(
    lambda ctx: path_sensor(spark, awaited),
    name="wait_upstream",
    poke_interval_s=0.05,
    timeout_s=30,
)


@p.task()
def write_awaited(ctx):
    # occupies the one worker slot WHILE the sensor is parked — proof
    # the deferrable wait holds no slot; a short delay guarantees the
    # sensor observed at least one negative poke first
    time.sleep(0.2)
    spark.range(3).write.mode("overwrite").parquet(awaited)
    return "written"


@p.task(depends_on=["wait_upstream", "write_awaited"])
def done(ctx):
    return "ok"


scheduler.register(p, dataset=DatasetTrigger(watched), state_store=state)

runs = scheduler.run_pending()
assert runs == [], "must not fire before the dataset exists"
with open(os.path.join(watched, "part-0.parquet"), "wb") as f:
    f.write(b"upstream-push")
runs = scheduler.run_pending()
server.shutdown()
assert len(runs) == 1 and runs[0].ok, f"triggered run failed: {runs!r}"
recorded = state.run_stats()
row = [r for r in recorded.collect() if r["pipeline"] == "smoke_triggered"]
assert row and row[0]["n_runs"] >= 1, f"state store missing run: {recorded}"
print("compose smoke OK: entrypoint serves, healthcheck passes, "
      "dataset-triggered run with a deferrable sensor reached the "
      "state store")
EOF
