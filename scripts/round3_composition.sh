#!/bin/bash
# Round-3 "real composition" pipeline (VERDICT r2 item 2):
#   1. extend FCGF synthetic training 25 -> 100 epochs (warm start);
#   2. re-train PointDSC / OANet / DGR on descriptors from that encoder
#      (--features fcgf, the reference protocol: Experiments/train.py:23-146
#      trains PointDSC on extractor output, not GT-aligned surrogates);
#   3. run the benchmark matrix with --features fcgf + the new weights.
# Chained so the serialized TPU queue stays busy end-to-end.
set -x
cd /root/repo

# ---- 1. FCGF 100 epochs total ------------------------------------------- #
timeout 14400 python -m lidarreg.cli.train --model fcgf \
  --epochs 75 --steps_per_epoch 100 \
  --resume weights/fcgf_synthetic_25ep.msgpack \
  --outdir outputs/r3_fcgf100 2>&1 | tail -20
last=$(ls outputs/r3_fcgf100/model_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$last" ]; then
  cp "$last" weights/fcgf_synthetic_100ep.msgpack
  cp outputs/r3_fcgf100/*.config.json weights/fcgf_synthetic_100ep.msgpack.config.json 2>/dev/null || true
fi
FCGF=weights/fcgf_synthetic_100ep.msgpack
[ -f "$FCGF" ] || FCGF=weights/fcgf_synthetic_25ep.msgpack

# ---- 2. learned models over FCGF features ------------------------------- #
for m in pointdsc oanet dgr; do
  timeout 7200 python -m lidarreg.cli.train --model $m \
    --features fcgf --fcgf_weights_file "$FCGF" \
    --epochs 8 --steps_per_epoch 50 --capacity 8192 \
    --outdir outputs/r3_${m}_fcgf 2>&1 | tail -8
  best=outputs/r3_${m}_fcgf/model_best.msgpack
  [ -f "$best" ] || best=$(ls outputs/r3_${m}_fcgf/model_*.msgpack 2>/dev/null | sort -V | tail -1)
  if [ -n "$best" ] && [ -f "$best" ]; then
    cp "$best" weights/${m}_fcgf_trained.msgpack
    cp outputs/r3_${m}_fcgf/*.config.json weights/${m}_fcgf_trained.msgpack.config.json 2>/dev/null || true
  fi
done

# ---- 3. benchmark matrix over FCGF features ----------------------------- #
timeout 7200 python scripts/benchmark_matrix.py \
  --features fcgf --fcgf_weights "$FCGF" \
  --pointdsc_weights weights/pointdsc_fcgf_trained.msgpack \
  --oanet_weights weights/oanet_fcgf_trained.msgpack \
  --dgr_weights weights/dgr_fcgf_trained.msgpack \
  2>&1 | tail -40
