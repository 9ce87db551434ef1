#!/bin/bash
# Round-3 composition v3: learned models over FCGF trained on TEXTURED
# scenes (weights/fcgf_textured_20ep.msgpack, promoted by round3_chain2.sh
# step 5 from the best-by-NN-inlier checkpoint).
#   1. re-train PointDSC / OANet / DGR on those descriptors
#      (reference protocol: Experiments/train.py:23-146 trains on
#      extractor output, not GT-aligned surrogates);
#   2. benchmark matrix over FCGF features (the real composition);
#   3. bench.py (gate + headline, picks up the textured checkpoint);
#   4. solver stage profile.
set -x
cd /root/repo

FCGF=weights/fcgf_textured_20ep.msgpack
[ -f "$FCGF" ] || exit 1

for m in pointdsc oanet dgr; do
  timeout 7200 python -m lidarreg.cli.train --model $m \
    --features fcgf --fcgf_weights_file "$FCGF" \
    --epochs 8 --steps_per_epoch 50 --capacity 8192 \
    --outdir outputs/r3_${m}_fcgf3 2>&1 | tail -8
  best=outputs/r3_${m}_fcgf3/model_best.msgpack
  [ -f "$best" ] || best=$(ls outputs/r3_${m}_fcgf3/model_*.msgpack 2>/dev/null | sort -V | tail -1)
  if [ -n "$best" ] && [ -f "$best" ]; then
    cp "$best" weights/${m}_fcgf_trained.msgpack
    cp "${best}.config.json" weights/${m}_fcgf_trained.msgpack.config.json 2>/dev/null || true
  fi
done

timeout 10800 python scripts/benchmark_matrix.py \
  --features fcgf --fcgf_weights "$FCGF" \
  --pointdsc_weights weights/pointdsc_fcgf_trained.msgpack \
  --oanet_weights weights/oanet_fcgf_trained.msgpack \
  --dgr_weights weights/dgr_fcgf_trained.msgpack \
  2>&1 | tail -40

timeout 3600 python bench.py 2>&1 | tail -12
timeout 1800 python scripts/profile_solver.py 2>&1 | tail -15
