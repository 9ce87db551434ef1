#!/bin/bash
# Round-3 learned-over-FCGF composition (VERDICT r2 item 2): train
# PointDSC / OANet / DGR on descriptors from the TEXTURED-scene FCGF
# checkpoint, then benchmark each row over the same features.
#
# Usage: round3_composition.sh [FCGF_CKPT]
# Gated on the matchability probe: only launch once the probe shows the
# checkpoint's eval-mode NN inlier ratio well above the surrogate-free
# floor (the 100-ep collapsed runs gave 0.6% -> 0% recall; see
# BASELINE.md round-3 matchability-collapse section).
set -x
cd /root/repo

FCGF=${1:-weights/fcgf_textured_20ep.msgpack}
[ -f "$FCGF" ] || { echo "missing $FCGF"; exit 1; }

# RANSAC over the trained features: the inlier-ratio anchor row
timeout 3600 python -m lidarreg.cli.test --dataset A --algo RANSAC \
  --mode GPF --iters 50000 --max_samples 12 \
  --features fcgf --fcgf_weights_file "$FCGF" \
  --outdir outputs/r3_fcgf_textured_eval 2>&1 | tail -8

for m in pointdsc oanet dgr; do
  timeout 10800 python -m lidarreg.cli.train --model $m \
    --epochs 6 --steps_per_epoch 50 \
    --features fcgf --fcgf_weights_file "$FCGF" \
    --outdir outputs/r3_${m}_textured 2>&1 | tail -6
done

# matrix rows over the same features
timeout 7200 python scripts/benchmark_matrix.py \
  --algos RANSAC PointDSC OANet DGR \
  --features fcgf --fcgf_weights "$FCGF" \
  --pointdsc_weights outputs/r3_pointdsc_textured/model_best.msgpack \
  --oanet_weights outputs/r3_oanet_textured/model_best.msgpack \
  --dgr_weights outputs/r3_dgr_textured/model_best.msgpack \
  2>&1 | tail -20
