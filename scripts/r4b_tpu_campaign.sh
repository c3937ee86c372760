#!/bin/bash
# Round-4 follow-up TPU campaign (serial; run after r4_tpu_campaign.sh).
#   1. re-run k6_grouped (its first attempt died to a transient TPU-worker
#      crash at commit time)
#   2. the rest of the reference benchmark grid (run_benchmark.py:42-50):
#      u32_add 2^22, b32_mul 2^20, groestl 2^14 (2^13 keccak runs in r4).
#   3. bench.py (captures the new pallas-Groestl + commit-encode metrics).
cd /root/repo || exit 1
L=/tmp/r4_campaign
mkdir -p $L

run() {
  name=$1; shift
  echo "=== $name: $(date) ===" >> $L/campaign.log
  "$@" > "$L/$name.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> $L/campaign.log
}

run k6_grouped_retry env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    BINIUS_TRACE_PHASES=2 timeout 14400 python scripts/keccak_tpu_timing.py 6
run u32_add_2e22 timeout 10800 python examples/u32_add.py --log-n-adds 22
run b32_mul_2e20 timeout 10800 python examples/b32_mul.py --log-n-muls 20
run groestl_2e14 timeout 14400 python examples/groestl.py --log-n-permutations 14
run bench timeout 3600 python bench.py
echo "=== r4b campaign complete $(date) ===" >> $L/campaign.log
