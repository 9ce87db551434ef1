#!/bin/bash
# Round-3 TPU chain (resumed session), ordered so a SHORT TPU window still
# produces the headline evidence: correctness gate + bench + throughput
# first, then DGR (VERDICT r2 item 3), then the textured FCGF retrain that
# gates the learned-over-FCGF composition (item 2). The tunneled TPU runs
# one job at a time.
set -x
cd /root/repo

# ---- 0. fused structure build: TPU parity + timing A/B ------------------- #
# MUST run first: training and bench now default to the fused path, and the
# CPU-exact parity test can't see v5e-specific miscompiles (two prior
# scatter/gather miscompiles on this chip — hashtable.py notes).
timeout 3600 python scripts/fused_ab.py 32768 2>&1 | tail -6

# ---- 0b. headline bench (solver + e2e, confidence termination now on) ---- #
timeout 3600 python bench.py 2>&1 | tail -12

# ---- 0c. pair-batched solver throughput (vmapped match+solve) ------------ #
timeout 3600 python scripts/batch_throughput.py 1 2 4 8 2>&1 | tail -6

# ---- 1. DGR pruned vs unpruned forward/e2e timing ------------------------ #
timeout 2400 python scripts/profile_dgr.py 64 2>&1 | tail -4
timeout 2400 python scripts/profile_dgr.py 0 2>&1 | tail -4

# ---- 2. DGR matrix row with pruning (same protocol as round 2) ----------- #
timeout 5400 python scripts/benchmark_matrix.py --algos DGR \
  --dgr_weights outputs/r2_dgr_surr/model_best.msgpack 2>&1 | tail -12

# ---- 2b. GC_RANSAC matrix row with the native graph-cut LO --------------- #
# (VERDICT r2 item 10: the row must measure the real optimizer, not alias
# the RANSAC row; cheap — 12 pairs, 50k budget.)
timeout 3600 python scripts/benchmark_matrix.py \
  --algos RANSAC GC_RANSAC 2>&1 | tail -8

# ---- 3. textured FCGF retrain (matchability-collapse fix) ---------------- #
timeout 10800 python -m lidarreg.cli.train --model fcgf \
  --epochs 30 --steps_per_epoch 100 \
  --outdir outputs/r3_fcgf_textured 2>&1 | tail -15

# ---- 4. matchability probe over the checkpoint trajectory ---------------- #
timeout 3600 python scripts/matchability_probe.py \
  --ckpt_dir outputs/r3_fcgf_textured \
  --epochs 0,1,2,4,8,12,16,20,24,29 \
  --extra weights/fcgf_synthetic_25ep.msgpack 2>&1 | grep -v WARNING

# ---- 5. promote best-by-NN-inlier checkpoint ----------------------------- #
if [ -f outputs/r3_fcgf_textured/model_best.msgpack ]; then
  cp outputs/r3_fcgf_textured/model_best.msgpack weights/fcgf_textured_20ep.msgpack
  cp outputs/r3_fcgf_textured/model_best.msgpack.config.json \
     weights/fcgf_textured_20ep.msgpack.config.json 2>/dev/null || true
fi

# ---- 6. feature-quality eval: NN inlier + RANSAC recall over 12 pairs ---- #
timeout 3600 python -m lidarreg.cli.test --dataset A --algo RANSAC --mode GPF \
  --iters 50000 --max_samples 12 --features fcgf \
  --fcgf_weights_file weights/fcgf_textured_20ep.msgpack \
  --outdir outputs/r3_fcgf_textured_eval 2>&1 | tail -25

# ---- 7. NN-matmul precision ablation (recall + time per tier) ------------ #
timeout 3600 python scripts/knn_precision_ablation.py --pairs 30 2>&1 | tail -6

# ---- 8. gated composition: only if the textured features actually work --- #
# (a collapsed encoder would waste ~3 h of TPU re-training learned models
# over bad descriptors — the round-3 matchability lesson)
rec=$(grep -oE "recall: [0-9.]+" outputs/r3_fcgf_textured_eval/log.txt 2>/dev/null | head -1 | grep -oE "[0-9.]+")
echo "textured eval recall: ${rec:-none}"
if [ -n "$rec" ] && python -c "import sys; sys.exit(0 if float('$rec') >= 50 else 1)"; then
  bash scripts/round3_composition3.sh
else
  echo "composition gated OFF (recall ${rec:-unknown} < 50); rerunning bench only"
  timeout 3600 python bench.py 2>&1 | tail -12
fi
