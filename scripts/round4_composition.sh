#!/bin/bash
# Round-4 composition completion (VERDICT r3 next-round #3):
#   1. re-train OANet over the trained FCGF descriptors with the FIXED
#      trainer default (weight_transformation=0 — the reference's
#      config.py:46; the 1.0 default is what diverged in round 3);
#   2. benchmark matrix over FCGF features for OANet + DGR (the PointDSC
#      row landed in round 3; DGR trained post-snapshot);
#   3. bench.py headline (gate + solver, two-dispatch protocol).
set -x
cd /root/repo

FCGF=weights/fcgf_textured_20ep.msgpack
[ -f "$FCGF" ] || exit 1

# ---- 1. OANet retrain with metric-only transformation loss -------------- #
timeout 7200 python -m lidarreg.cli.train --model oanet \
  --features fcgf --fcgf_weights_file "$FCGF" \
  --epochs 8 --steps_per_epoch 50 --capacity 8192 \
  --outdir outputs/r4_oanet_fcgf 2>&1 | tail -8
best=outputs/r4_oanet_fcgf/model_best.msgpack
[ -f "$best" ] || best=$(ls outputs/r4_oanet_fcgf/model_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$best" ] && [ -f "$best" ]; then
  cp "$best" weights/oanet_fcgf_trained.msgpack
  cp "${best}.config.json" weights/oanet_fcgf_trained.msgpack.config.json 2>/dev/null || true
fi

# ---- 2. matrix rows over trained FCGF: OANet + DGR (+RANSAC anchor) ----- #
timeout 10800 python scripts/benchmark_matrix.py \
  --features fcgf --fcgf_weights "$FCGF" \
  --algos RANSAC OANet DGR \
  --oanet_weights weights/oanet_fcgf_trained.msgpack \
  --dgr_weights weights/dgr_fcgf_trained.msgpack 2>&1 | tail -30

# ---- 3. headline ---------------------------------------------------------#
timeout 3600 python bench.py 2>&1 | tail -12
