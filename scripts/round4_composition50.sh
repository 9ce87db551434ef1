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
  if [ ! -f "$best" ]; then
    # fall back to the last epoch checkpoint, but say so loudly — a weight
    # installed without model_best provenance must be visible in the log
    # (round-4 ADVICE item 4)
    best=$(ls outputs/r4_${m}_fcgf50/model_*.msgpack 2>/dev/null | sort -V | tail -1)
    echo "WARNING: $m model_best.msgpack missing; installing last-epoch ${best:-<none>}"
  fi
  if [ -n "$best" ] && [ -f "$best" ]; then
    echo "installing weights/${m}_fcgf_trained.msgpack <- $best"
    cp "$best" weights/${m}_fcgf_trained.msgpack
    if ! cp "${best}.config.json" weights/${m}_fcgf_trained.msgpack.config.json; then
      echo "ERROR: config snapshot ${best}.config.json missing — weight/config pair would disagree" >&2
      exit 1
    fi
  else
    echo "ERROR: no checkpoint produced for $m" >&2
    exit 1
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
