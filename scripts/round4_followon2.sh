#!/bin/bash
# Round-4 follow-on #2: wait for the running forward_build_ab (A/B gate),
# then the composition matrix (rerun after the sys.path fix), then pytest.
cd /root/repo
AB_PID=${1:?usage: round4_followon2.sh <ab_pid>}
while kill -0 "$AB_PID" 2>/dev/null; do sleep 60; done
echo "=== A/B done; matrix $(date -u +%H:%M:%S)"
timeout 10800 python scripts/benchmark_matrix.py \
  --features fcgf --fcgf_weights weights/fcgf_textured_20ep.msgpack \
  --algos RANSAC OANet DGR \
  --oanet_weights weights/oanet_fcgf_trained.msgpack \
  --dgr_weights weights/dgr_fcgf_trained.msgpack \
  > outputs/r4_matrix_fcgf.log 2>&1
tail -20 outputs/r4_matrix_fcgf.log
echo "=== full pytest $(date -u +%H:%M:%S)"
timeout 5400 python -m pytest tests/ -q > outputs/r4_pytest.log 2>&1
tail -3 outputs/r4_pytest.log
echo "=== follow-on2 done $(date -u +%H:%M:%S)"
