#!/bin/bash
# Real-data readiness drill (VERDICT r3 next-round #9): the day the raw
# archives mount, this ONE command fills the entire "To be filled when raw
# data mounts" table in BASELINE.md — all four balanced sets x the full
# algorithm matrix — with no edits:
#
#   LIDARREG_DATA=/data/lidarreg scripts/fill_baseline.sh
#
# Protocol parity: reference Experiments/test_parallel.sh:1-24 (one
# test.py invocation per (dataset, algo), report line per run).
#
# Environment:
#   LIDARREG_DATA           raw archive root (required for the real fill)
#   LIDARREG_BALANCED_SETS  balanced-set txt root (default: the published
#                           sets under /root/reference/balanced_sets)
# Options (all have real-fill defaults; the CI dry-run narrows them):
#   --sets "A B S K"     datasets (nicknames, data/adapters.py)
#   --algos "RANSAC GC_RANSAC TEASER PointDSC DGR"
#   --samples N          pairs per set (default: full set)
#   --iters N            RANSAC budget (default 1000000)
#   --features NAME      fcgf (default) | surrogate (dry-run)
#   --capacity N         voxel capacity (default 32768)
#   --tiny true          tiny model configs (dry-run)
#   --outdir DIR         default outputs/fill_baseline
#   --synthetic true     synthetic adapter instead of raw (smoke only)
set -e
cd "$(dirname "$0")/.."

SETS="A B S K"
ALGOS="RANSAC GC_RANSAC TEASER PointDSC DGR"
SAMPLES=""
ITERS=1000000
FEATURES=fcgf
CAPACITY=32768
TINY=false
OUTDIR=outputs/fill_baseline
SYNTHETIC=false
while [ $# -gt 0 ]; do
  case "$1" in
    --sets) SETS="$2"; shift 2;;
    --algos) ALGOS="$2"; shift 2;;
    --samples) SAMPLES="$2"; shift 2;;
    --iters) ITERS="$2"; shift 2;;
    --features) FEATURES="$2"; shift 2;;
    --capacity) CAPACITY="$2"; shift 2;;
    --tiny) TINY="$2"; shift 2;;
    --outdir) OUTDIR="$2"; shift 2;;
    --synthetic) SYNTHETIC="$2"; shift 2;;
    *) echo "unknown arg $1"; exit 2;;
  esac
done

if [ "$SYNTHETIC" != "true" ] && [ -z "$LIDARREG_DATA" ]; then
  echo "LIDARREG_DATA is not set (raw archives unmounted)." >&2
  echo "Set it, or pass --synthetic true for a smoke run." >&2
  exit 3
fi

mkdir -p "$OUTDIR"
ROWS="$OUTDIR/BASELINE_rows.md"
{
  echo "## Regenerated reference numbers ($(date -u +%F))"
  echo ""
  echo "| Dataset | Algo | recall | TE (cm) | RE (deg) | mean reg time |"
  echo "|---|---|---|---|---|---|"
} > "$ROWS"

# weights per learned algo (the committed round-3/4 checkpoints)
WARGS_PointDSC="--pointdsc_weights_file weights/pointdsc_fcgf_trained.msgpack"
WARGS_DGR="--dgr_weights_file weights/dgr_fcgf_trained.msgpack"
WARGS_OANet="--oanet_weights_file weights/oanet_fcgf_trained.msgpack"
FCGF_W=""
if [ "$FEATURES" = "fcgf" ]; then
  FCGF_W="--fcgf_weights_file weights/fcgf_textured_20ep.msgpack"
fi

for DS in $SETS; do
  for ALGO in $ALGOS; do
    RUN="$OUTDIR/${DS}_${ALGO}"
    mkdir -p "$RUN"
    EXTRA=""
    case "$ALGO" in
      PointDSC) EXTRA="$WARGS_PointDSC";;
      DGR) EXTRA="$WARGS_DGR";;
      OANet) EXTRA="$WARGS_OANet";;
    esac
    [ -n "$SAMPLES" ] && EXTRA="$EXTRA --max_samples $SAMPLES"
    echo "=== $DS / $ALGO -> $RUN ==="
    if python -m lidarreg.cli.test \
        --dataset "$DS" --algo "$ALGO" --mode GPF \
        --iters "$ITERS" --synthetic "$SYNTHETIC" \
        --features "$FEATURES" $FCGF_W \
        --capacity "$CAPACITY" --tiny "$TINY" \
        --outdir "$RUN" $EXTRA 2>&1 | tee "$RUN/console.txt" | tail -6
    then
      # report line (harness.py:190): "ALGO | recall: R%, #failed/#total:
      # f/t, TE(cm): x, RE(deg): y, mean reg time(s): z, ..."
      LINE=$(grep -E '\| recall:' "$RUN/log.txt" | grep -v '+ICP' | tail -1)
      REC=$(echo "$LINE" | grep -oE "recall: [0-9.]+" | grep -oE "[0-9.]+")
      TE=$(echo "$LINE" | grep -oE "TE\(cm\): [0-9.]+" | grep -oE "[0-9.]+" | head -1)
      RE=$(echo "$LINE" | grep -oE "RE\(deg\): [0-9.]+" | grep -oE "[0-9.]+" | head -1)
      TIME=$(echo "$LINE" | grep -oE "mean reg time\(s\): [0-9.]+" | grep -oE "[0-9.]+" | head -1)
      TIME="${TIME:+${TIME} s}"
      echo "| $DS | $ALGO | ${REC:--}% | ${TE:--} | ${RE:--} | ${TIME:--} |" >> "$ROWS"
    else
      echo "| $DS | $ALGO | FAILED | — | — | — |" >> "$ROWS"
    fi
  done
done

echo ""
echo "==== rows for BASELINE.md ===="
cat "$ROWS"
