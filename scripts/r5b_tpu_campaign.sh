#!/bin/bash
# Round-5 campaign, part B: runs AFTER the part-A k10 (which measured the
# round-4 lowering from its in-memory code). Everything here runs the NEW
# reference-parity lowering (merged partition claims + composition-grouped
# kernels), in dependency order: k10 first to warm the new kernel shapes and
# give the old-vs-new comparison at a known size, then the owed reference
# grid (VERDICT #3), then bench.
cd /root/repo || exit 1
L=/tmp/r5_campaign
mkdir -p $L

run() {
  name=$1; shift
  echo "=== $name: $(date) ===" >> $L/campaign.log
  "$@" > "$L/$name.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> $L/campaign.log
}

run k10_newlowering env BINIUS_TRACE_PHASES=2 \
    timeout 14400 python scripts/keccak_tpu_timing.py 10
run k13_newlowering timeout 10800 python scripts/keccak_tpu_timing.py 13
run u32_add_2e22 timeout 10800 python examples/u32_add.py --log-n-adds 22 --repeat 2
run b32_mul_2e20 timeout 10800 python examples/b32_mul.py --log-n-muls 20 --repeat 2
run groestl_2e14 timeout 14400 python examples/groestl.py --log-n-permutations 14 --repeat 2
run k6_newlowering env BINIUS_TRACE_PHASES=2 \
    timeout 7200 python scripts/keccak_tpu_timing.py 6
run bench timeout 3600 python bench.py
echo "=== r5b campaign complete $(date) ===" >> $L/campaign.log
