#!/bin/bash
# Round-4 serial TPU measurement campaign (one job at a time — the relay and
# the 4-vCPU host both degrade badly under concurrency; see CLAUDE.md).
# Every step shares the repo-local persistent compile cache, so a step that
# dies mid-compile still advances the next attempt.
cd /root/repo || exit 1
L=/tmp/r4_campaign
mkdir -p $L

run() {
  name=$1; shift
  echo "=== $name: $(date) ===" >> $L/campaign.log
  "$@" > "$L/$name.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> $L/campaign.log
}

# keccak 2^6: batched (r3-comparable regime) then grouped (the round-3 thesis fix)
run k6_batched env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=0 \
    timeout 10800 python scripts/keccak_tpu_timing.py 6
run k6_grouped env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    timeout 14400 python scripts/keccak_tpu_timing.py 6
# keccak 2^10: grouped (best known regime) — the r3 headline size
run k10_grouped env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    timeout 14400 python scripts/keccak_tpu_timing.py 10
# keccak 2^13: the reference benchmark grid size (VERDICT #3)
run k13_grouped env BINIUS_BATCH_ROUND_KERNELS=1 BINIUS_GROUP_CLAIMS=1 \
    timeout 21600 python scripts/keccak_tpu_timing.py 13
echo "=== campaign complete $(date) ===" >> $L/campaign.log
