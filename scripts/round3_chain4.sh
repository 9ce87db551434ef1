#!/bin/bash
# Round-3 chain v4 (fresh VM, TPU confirmed up at launch): the remaining
# VERDICT r2 evidence, ordered so partial completion still pays.
#   1. textured FCGF retrain (matchability-collapse fix; model_best picked
#      by eval-mode NN inlier ratio, never loss) -> weights/fcgf_textured_20ep
#   2. feature-quality eval over 12 validation pairs (RANSAC-50k)
#   3. gated composition: PointDSC/OANet/DGR re-trained over the trained
#      FCGF descriptors (reference protocol, Experiments/train.py:23-146)
#      + matrix rows over those features
#   4. DGR pruned vs unpruned profile (VERDICT r2 item 3 timing evidence)
#   5. DGR surrogate retrain (r2 outputs/ were wiped with the VM) + matrix row
#   6. GC_RANSAC (native graph-cut LO) vs RANSAC matrix rows (item 10)
#   7. headline bench
set -x
cd /root/repo
mkdir -p outputs

# ---- 0. fused structure build: on-TPU parity gate ------------------------ #
# MUST run first (round3_chain2.sh rationale): training/bench default to the
# fused path, the CPU bit-exact parity test can't see v5e-specific scatter
# miscompiles (two prior ones on this chip — sparse/hashtable.py), and the
# round-3 roofline numbers predate the fused-build commit. On parity
# failure every later step falls back to the serialized round-2 path.
timeout 2400 python scripts/fused_ab.py 32768 2>&1 | tee outputs/fused_ab.log | tail -8
err=$(grep -oE "max\|fused - serial\| = [0-9.e+-]+" outputs/fused_ab.log | head -1 | grep -oE "[0-9.e+-]+$")
echo "fused parity err: ${err:-none}"
if [ -z "$err" ] || ! python -c "import sys; sys.exit(0 if float('$err') < 1e-3 else 1)"; then
  echo "FUSED PARITY FAILED on TPU -> serialized fallback for the chain"
  export LIDARREG_FUSED_BUILD=0
fi

# ---- 1. textured FCGF retrain ------------------------------------------- #
timeout 2700 python -m lidarreg.cli.train --model fcgf \
  --epochs 20 --steps_per_epoch 100 \
  --outdir outputs/r3_fcgf_textured 2>&1 | tail -30

best=outputs/r3_fcgf_textured/model_best.msgpack
if [ -f "$best" ]; then
  cp "$best" weights/fcgf_textured_20ep.msgpack
  cp "${best}.config.json" weights/fcgf_textured_20ep.msgpack.config.json 2>/dev/null || true
fi

# ---- 2. feature-quality eval -------------------------------------------- #
if [ -f weights/fcgf_textured_20ep.msgpack ]; then
  timeout 2400 python -m lidarreg.cli.test --dataset A --algo RANSAC --mode GPF \
    --iters 50000 --max_samples 12 --features fcgf \
    --fcgf_weights_file weights/fcgf_textured_20ep.msgpack \
    --outdir outputs/r3_fcgf_textured_eval 2>&1 | tail -25
fi

# ---- 3. gated composition ----------------------------------------------- #
rec=$(grep -oE "recall: [0-9.]+" outputs/r3_fcgf_textured_eval/log.txt 2>/dev/null | head -1 | grep -oE "[0-9.]+")
echo "textured eval recall: ${rec:-none}"
if [ -n "$rec" ] && python -c "import sys; sys.exit(0 if float('$rec') >= 50 else 1)"; then
  FCGF=weights/fcgf_textured_20ep.msgpack
  for m in pointdsc oanet dgr; do
    timeout 3600 python -m lidarreg.cli.train --model $m \
      --features fcgf --fcgf_weights_file "$FCGF" \
      --epochs 6 --steps_per_epoch 50 --capacity 8192 \
      --outdir outputs/r3_${m}_fcgf 2>&1 | tail -8
    b=outputs/r3_${m}_fcgf/model_best.msgpack
    [ -f "$b" ] || b=$(ls outputs/r3_${m}_fcgf/model_*.msgpack 2>/dev/null | sort -V | tail -1)
    if [ -n "$b" ] && [ -f "$b" ]; then
      cp "$b" weights/${m}_fcgf_trained.msgpack
      cp "${b}.config.json" weights/${m}_fcgf_trained.msgpack.config.json 2>/dev/null || true
    fi
  done
  timeout 7200 python scripts/benchmark_matrix.py \
    --features fcgf --fcgf_weights "$FCGF" \
    --algos RANSAC PointDSC OANet DGR \
    --pointdsc_weights weights/pointdsc_fcgf_trained.msgpack \
    --oanet_weights weights/oanet_fcgf_trained.msgpack \
    --dgr_weights weights/dgr_fcgf_trained.msgpack 2>&1 | tail -40
else
  echo "composition gated OFF (recall ${rec:-unknown} < 50)"
fi

# ---- 4. DGR pruned vs unpruned forward/e2e timing ------------------------ #
timeout 2400 python scripts/profile_dgr.py 64 2>&1 | tail -6
timeout 2400 python scripts/profile_dgr.py 0 2>&1 | tail -6

# ---- 5. DGR surrogate retrain + matrix row ------------------------------- #
timeout 3600 python -m lidarreg.cli.train --model dgr \
  --features surrogate --epochs 8 --steps_per_epoch 50 --capacity 8192 \
  --outdir outputs/r3_dgr_surr 2>&1 | tail -8
b=outputs/r3_dgr_surr/model_best.msgpack
[ -f "$b" ] || b=$(ls outputs/r3_dgr_surr/model_*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -n "$b" ] && [ -f "$b" ]; then
  cp "$b" weights/dgr_surrogate_trained.msgpack
  cp "${b}.config.json" weights/dgr_surrogate_trained.msgpack.config.json 2>/dev/null || true
  timeout 5400 python scripts/benchmark_matrix.py --algos DGR \
    --dgr_weights weights/dgr_surrogate_trained.msgpack 2>&1 | tail -12
fi

# ---- 6. GC_RANSAC (native graph-cut LO) vs RANSAC ------------------------ #
timeout 3600 python scripts/benchmark_matrix.py \
  --algos RANSAC GC_RANSAC 2>&1 | tail -10

# ---- 7. headline bench --------------------------------------------------- #
timeout 3600 python bench.py 2>&1 | tail -12
echo "CHAIN4 DONE $(date -u +%H:%M:%S)"
