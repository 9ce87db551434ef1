#!/bin/bash
# Round-3 composition v2: learned models over FCGF trained on DISTINCTIVE
# synthetic scenes (see data/adapters.synthesize_lidar_scene).
#   1. promote the distinct-scene checkpoint;
#   2. quick feature-quality eval (NN inlier ratio + RANSAC recall);
#   3. re-train PointDSC / OANet / DGR on those descriptors
#      (reference protocol: Experiments/train.py:23-146 trains on
#      extractor output, not GT-aligned surrogates);
#   4. benchmark matrix over FCGF features;
#   5. bench.py (gate + headline with the round-3 solver);
#   6. solver stage profile.
set -x
cd /root/repo

last=$(ls outputs/r3_fcgf_distinct/model_best.msgpack 2>/dev/null)
[ -z "$last" ] && last=$(ls outputs/r3_fcgf_distinct/model_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$last" ]; then
  cp "$last" weights/fcgf_distinct_100ep.msgpack
  cp "${last%.msgpack}.msgpack.config.json" weights/fcgf_distinct_100ep.msgpack.config.json 2>/dev/null || \
    cp outputs/r3_fcgf_distinct/model_best.msgpack.config.json weights/fcgf_distinct_100ep.msgpack.config.json 2>/dev/null || true
fi
FCGF=weights/fcgf_distinct_100ep.msgpack
[ -f "$FCGF" ] || exit 1

# ---- 2. feature-quality eval -------------------------------------------- #
timeout 3600 python -m lidarreg.cli.test --dataset A --algo RANSAC --mode GPF \
  --iters 50000 --max_samples 12 --features fcgf \
  --fcgf_weights_file "$FCGF" --outdir outputs/r3_fcgf_distinct_eval \
  2>&1 | tail -30

# ---- 3. learned models over FCGF features ------------------------------- #
for m in pointdsc oanet dgr; do
  timeout 7200 python -m lidarreg.cli.train --model $m \
    --features fcgf --fcgf_weights_file "$FCGF" \
    --epochs 8 --steps_per_epoch 50 --capacity 8192 \
    --outdir outputs/r3_${m}_fcgf2 2>&1 | tail -8
  best=outputs/r3_${m}_fcgf2/model_best.msgpack
  [ -f "$best" ] || best=$(ls outputs/r3_${m}_fcgf2/model_*.msgpack 2>/dev/null | sort -V | tail -1)
  if [ -n "$best" ] && [ -f "$best" ]; then
    cp "$best" weights/${m}_fcgf_trained.msgpack
    cp outputs/r3_${m}_fcgf2/*best*.config.json weights/${m}_fcgf_trained.msgpack.config.json 2>/dev/null || true
  fi
done

# ---- 4. benchmark matrix over FCGF features ----------------------------- #
timeout 7200 python scripts/benchmark_matrix.py \
  --features fcgf --fcgf_weights "$FCGF" \
  --pointdsc_weights weights/pointdsc_fcgf_trained.msgpack \
  --oanet_weights weights/oanet_fcgf_trained.msgpack \
  --dgr_weights weights/dgr_fcgf_trained.msgpack \
  2>&1 | tail -40

# ---- 5. bench + 6. solver profile --------------------------------------- #
timeout 3600 python bench.py 2>&1 | tail -12
timeout 1800 python scripts/profile_solver.py 2>&1 | tail -15
