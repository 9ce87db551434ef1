#!/bin/bash
# Round-4 session-2 chain: the remaining VERDICT r3 items, serialized on
# the one TPU + one host core:
#   1. SPRT low-inlier ablation (VERDICT #8) — short, timed;
#   2. FCGF +30-epoch warm start (VERDICT #2, e2e gate) — longest;
#   3. composition matrix over trained FCGF (VERDICT #3) + headline bench.
# Each step logs under outputs/ and the chain continues past failures so a
# late step still runs if an early one dies.
set -x
cd /root/repo

echo "=== step 1: sprt ablation $(date -u +%H:%M:%S)"
timeout 3600 python scripts/sprt_ablation.py \
  > outputs/r4_sprt_ablation.log 2>&1
tail -15 outputs/r4_sprt_ablation.log

echo "=== step 2: fcgf +30ep $(date -u +%H:%M:%S)"
bash scripts/round4_fcgf_more.sh > outputs/r4_fcgf_more.log 2>&1
tail -10 outputs/r4_fcgf_more.log

echo "=== step 3: composition $(date -u +%H:%M:%S)"
bash scripts/round4_composition.sh > outputs/r4_composition.log 2>&1
tail -20 outputs/r4_composition.log

echo "=== chain done $(date -u +%H:%M:%S)"
