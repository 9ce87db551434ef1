#!/bin/bash
# Round-4 composition over the SHIPPED encoder (fcgf_textured_50ep — the
# checkpoint bench.py uses): retrain all three learned models on its
# descriptors (reference protocol: Experiments/train.py:23-146 trains on
# extractor output), then the matrix over the SAME descriptors. This
# replaces the 20-ep composition rows with an internally-consistent
# "learned models over the shipped checkpoint" matrix. OANet gets the
# longer budget (20 epochs) + the round-4 multi-pair val selection.
set -x
cd /root/repo

FCGF=weights/fcgf_textured_50ep.msgpack
[ -f "$FCGF" ] || exit 1

for m in pointdsc oanet dgr; do
  ep=8
  [ "$m" = oanet ] && ep=20
  timeout 9000 python -m lidarreg.cli.train --model $m \
    --features fcgf --fcgf_weights_file "$FCGF" \
    --epochs $ep --steps_per_epoch 50 --capacity 8192 \
    --outdir outputs/r4_${m}_fcgf50 2>&1 | tail -6
  best=outputs/r4_${m}_fcgf50/model_best.msgpack
  [ -f "$best" ] || best=$(ls outputs/r4_${m}_fcgf50/model_*.msgpack 2>/dev/null | sort -V | tail -1)
  if [ -n "$best" ] && [ -f "$best" ]; then
    cp "$best" weights/${m}_fcgf_trained.msgpack
    cp "${best}.config.json" weights/${m}_fcgf_trained.msgpack.config.json 2>/dev/null || true
  fi
done

timeout 10800 python scripts/benchmark_matrix.py \
  --features fcgf --fcgf_weights "$FCGF" \
  --algos RANSAC PointDSC OANet DGR \
  --pointdsc_weights weights/pointdsc_fcgf_trained.msgpack \
  --oanet_weights weights/oanet_fcgf_trained.msgpack \
  --dgr_weights weights/dgr_fcgf_trained.msgpack \
  > outputs/r4_matrix_fcgf50.log 2>&1
tail -12 outputs/r4_matrix_fcgf50.log

# refreshed headline (grouped-lookup default + e2e streaming metric)
timeout 3600 python bench.py 2>&1 | tail -14
