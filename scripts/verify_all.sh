#!/bin/sh
# The full pre-round-end verification chain, in the order that keeps
# every timing measurement on an uncontended JVM (never two local
# Spark drivers at once). ~45 min total at sf0.1 on local[32].
#
#   1. lint gate                     (seconds)
#   2. full test suite               (~12 min)
#   3. full-registry oracle, sf0.01  (~6 min; exit 0 = all green)
#   4. full-registry oracle, sf0.1   (~12 min; writes the committed
#                                     CORRECTNESS_LOCAL_sf0.1.json)
#   5. physical-plan audit           (PLANS.md, expect 0 flagged)
#   6. 10x scale audit               (SCALE.md)
#   7. bench at sf0.1                (BENCH_FULL.json; commit as
#                                     BENCH_FULL_r{N}.json)
set -e
cd "$(dirname "$0")/.."

./scripts/lint.sh
python3 -m pytest tests/ -q
python3 scripts/check_correctness.py /root/testdata/sf0.01
python3 scripts/check_correctness.py /root/testdata/sf0.1 \
    > CORRECTNESS_LOCAL_sf0.1.json
python3 scripts/plan_report.py
python3 scripts/scale_check.py 10
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" python3 bench.py
echo "verify_all: every gate green"
