#!/bin/sh
# The full pre-round-end verification chain, in the order that keeps
# every timing measurement on an uncontended JVM (never two local
# Spark drivers at once). ~50 min total at sf0.1 on local[32].
#
#   1. lint gate                     (seconds)
#   1b. oracle output-type gate      (seconds; DESCRIBE all oracles,
#                                     fail on HUGEINT/DECIMAL output)
#   2. full test suite               (~12 min)
#   3. full-registry oracle, sf0.001 (~3 min; writes committed artifact)
#   4. full-registry oracle, sf0.01  (~6 min; writes committed artifact)
#   5. full-registry oracle, sf0.1   (~12 min; writes committed artifact)
#   6. artifact-vs-registry gate     (refuses round-close if any scale's
#                                     artifact has n_queries != registry
#                                     size or any failure — the op_cuped
#                                     round-3 gap can't recur silently)
#   7. physical-plan audit           (PLANS.md, expect 0 flagged)
#   8. 10x scale audit               (SCALE.md)
#   9. bench at sf0.1                (BENCH_FULL.json; commit as
#                                     BENCH_FULL_r{N}.json)
#  10. streaming audit 1x/10x        (STREAM_BENCH.json/.md; run the
#                                     100x decade leg separately with
#                                     --scales 1,10,100 when refreshed)
set -e
cd "$(dirname "$0")/.."

./scripts/lint.sh
# oracle output-type gate (DuckDB DESCRIBE, ~2 s): no attested oracle
# may emit HUGEINT/DECIMAL — the driver's fetch path renders wide
# ints/decimals differently than the local type-blind normalizer (the
# q27 round-9 red row class)
python3 scripts/oracle_type_gate.py
python3 -m pytest tests/ -q
python3 scripts/check_correctness.py /root/testdata/sf0.001 \
    > CORRECTNESS_LOCAL_sf0.001.json
python3 scripts/check_correctness.py /root/testdata/sf0.01 \
    > CORRECTNESS_LOCAL_sf0.01.json
python3 scripts/check_correctness.py /root/testdata/sf0.1 \
    > CORRECTNESS_LOCAL_sf0.1.json
python3 - << 'EOF'
import json, sys
bad = []
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    with open(f"CORRECTNESS_LOCAL_{sf}.json") as f:
        rec = json.load(f)
    if rec["n_failures"]:
        bad.append(f"{sf}: {rec['n_failures']} failures")
    if rec["n_queries"] != rec["registry_size"]:
        bad.append(
            f"{sf}: artifact covers {rec['n_queries']} of "
            f"{rec['registry_size']} registry entries"
        )
    print(f"{sf}: {rec['n_queries']}/{rec['registry_size']} attested, "
          f"digest {json.dumps(rec['digest'])}")
if bad:
    sys.exit("REFUSING round-close: " + "; ".join(bad))
EOF
# per-round snapshots: the plain CORRECTNESS_LOCAL_sf*.json files
# overwrite each round — copy them to CORRECTNESS_LOCAL_r{N}_sf*.json
# so the 3-scale attestation history stays diffable round over round.
# Round number = newest driver BENCH_r*.json closure + 1 (the same
# rule bench.py's cross-round comparison uses).
ROUND="$(python3 -c 'import bench; print(bench._current_round())')"
for sf in sf0.001 sf0.01 sf0.1; do
    cp "CORRECTNESS_LOCAL_${sf}.json" \
       "CORRECTNESS_LOCAL_r${ROUND}_${sf}.json"
done
echo "round-close snapshots written for round ${ROUND}"
# rounding-tie distance audit (DuckDB-only, all 3 sfs): fails on any
# attested double column whose pre-round value sits on a round() tie
# that straddles a %.2f boundary — the r7 cusum / r8 holt flake class
python3 scripts/tie_audit.py > TIE_AUDIT.json
python3 scripts/plan_report.py
python3 scripts/scale_check.py 10
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" python3 bench.py
python3 scripts/stream_bench.py
echo "verify_all: every gate green"
