#!/bin/bash
# Round-3 FCGF retrain on TEXTURED scenes (matchability-collapse fix):
# ground micro-relief + whole-scene smooth warp make every local patch
# geometrically unique (data/adapters.synthesize_lidar_scene), so the
# hardest-contrastive optimum is no longer the degenerate low-rank
# embedding (BASELINE.md round-3 collapse section).
#
# Trains FRESH (cold start: warm-starting from a collapsed embedding
# keeps the collapse), then sweeps per-epoch checkpoints for NN inlier
# ratio + effective rank. Downstream (PointDSC/OANet/DGR composition) is
# gated on the probe result — launched separately after review, so a bad
# run doesn't burn the TPU queue like the 100-epoch chains did.
set -x
cd /root/repo

timeout 14400 python -m lidarreg.cli.train --model fcgf \
  --epochs 30 --steps_per_epoch 100 \
  --outdir outputs/r3_fcgf_textured 2>&1 | tail -15

timeout 3600 python scripts/matchability_probe.py \
  --ckpt_dir outputs/r3_fcgf_textured \
  --epochs 0,1,2,4,8,12,16,20,24,29 \
  --extra weights/fcgf_synthetic_25ep.msgpack 2>&1 | grep -v WARNING
