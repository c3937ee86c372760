#!/bin/bash
# Round-5 serial TPU measurement campaign (one job at a time — the relay and
# the 4-vCPU host both degrade badly under concurrency; see CLAUDE.md).
# Every step shares the repo-local persistent compile cache (.cache/jax_tpu),
# so a step that dies mid-compile still advances the next attempt. Container
# resets wipe /tmp but NOT the repo — results that matter go to BASELINE.md.
#
# Owed measurements (VERDICT r4 #3/#4/#6 + COVERAGE "honest remaining gaps"):
#   1. keccak 2^10 grouped with fine timers — re-measures the r4 headline AND
#      attributes the evalcheck wall (VERDICT #4)
#   2. keccak 2^13 — the reference benchmark-grid size (owed 3 rounds)
#   3. the rest of the reference grid: u32_add 2^22, b32_mul 2^20,
#      groestl 2^14
#   4. keccak 2^6 grouped — r3's 48.7 s at 2^6 formally unbeaten (VERDICT #6)
#   5. bench.py — refreshes the driver-contract metrics with a warm cache
cd /root/repo || exit 1
L=/tmp/r5_campaign
mkdir -p $L

run() {
  name=$1; shift
  echo "=== $name: $(date) ===" >> $L/campaign.log
  "$@" > "$L/$name.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> $L/campaign.log
}

run k10_grouped_timers env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    BINIUS_TRACE_PHASES=2 timeout 14400 python scripts/keccak_tpu_timing.py 10
run k13_grouped env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    timeout 21600 python scripts/keccak_tpu_timing.py 13
run u32_add_2e22 timeout 10800 python examples/u32_add.py --log-n-adds 22 --repeat 2
run b32_mul_2e20 timeout 10800 python examples/b32_mul.py --log-n-muls 20 --repeat 2
run groestl_2e14 timeout 14400 python examples/groestl.py --log-n-permutations 14 --repeat 2
run k6_grouped env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    BINIUS_TRACE_PHASES=2 timeout 7200 python scripts/keccak_tpu_timing.py 6
run bench timeout 3600 python bench.py
echo "=== r5 campaign complete $(date) ===" >> $L/campaign.log
