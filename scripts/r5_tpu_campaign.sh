#!/bin/bash
# Round-5 serial TPU measurement campaign (one job at a time — the relay and
# the 4-vCPU host both degrade badly under concurrency; see CLAUDE.md).
# Every step shares the repo-local persistent compile cache (.cache/jax_tpu),
# so a step that dies mid-compile still advances the next attempt. Container
# resets wipe /tmp but NOT the repo — results that matter go to BASELINE.md.
#
# Owed measurements (COVERAGE.md "Honest remaining gaps" + VERDICT r3 #3):
#   1. keccak 2^6 grouped with fine timers — attributes the evalcheck phase
#   2. keccak 2^13 — the reference benchmark-grid size
#   3. the rest of the reference grid: u32_add 2^22, b32_mul 2^20,
#      groestl 2^14
#   4. bench.py — refreshes the driver-contract metrics with a warm cache
cd /root/repo || exit 1
L=/tmp/r5_campaign
mkdir -p $L

run() {
  name=$1; shift
  echo "=== $name: $(date) ===" >> $L/campaign.log
  "$@" > "$L/$name.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> $L/campaign.log
}

run k6_grouped_timers env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    BINIUS_TRACE_PHASES=2 timeout 14400 python scripts/keccak_tpu_timing.py 6
run u32_add_2e22 timeout 10800 python examples/u32_add.py --log-n-adds 22
run b32_mul_2e20 timeout 10800 python examples/b32_mul.py --log-n-muls 20
run k13_grouped env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    timeout 21600 python scripts/keccak_tpu_timing.py 13
run groestl_2e14 timeout 14400 python examples/groestl.py --log-n-permutations 14
run bench timeout 3600 python bench.py
echo "=== r5 campaign complete $(date) ===" >> $L/campaign.log
