#!/bin/bash
# Round-close procedure: final bench + test run, regenerate README's
# measured numbers, snapshot the bench baseline for next round's trend
# gate (Bench.scala diffs BENCH_BASELINE.json, which intra-round runs
# never overwrite). Run from anywhere; operates on the repo root.
set -e
set -o pipefail # a test failure must fail the close, not hide behind tee
cd "$(dirname "$0")/.."
SPARK_GRAFT_SF_DIR="${1:-/root/testdata/sf0.1}" SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench"
sbt -batch test 2>&1 | tee target/test_summary.log | tail -4
# regenerate the plan-shape evidence at HEAD (PLANS.md is the scale
# contract's paper trail; a stale dump is worse than none)
sbt -batch "runMain graft.PlanDump"
python3 tools/gen_readme.py
# stamp the close run's numbers into STRESS.md VERBATIM so every STRESS
# citation of the close bench resolves to the committed BENCH_FULL.json
# (r15 verdict #4: a quoted close run must exist as an artifact)
python3 tools/stamp_close.py
cp BENCH_FULL.json BENCH_BASELINE.json
echo "round_close: done"
