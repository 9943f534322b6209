#!/usr/bin/env bash
# Canonical experiment configs — the reference's run_multi.sh (lines 11-45)
# rewritten for dspnet_tpu CLIs: 512x1024 Cityscapes, 8 det classes,
# resnet-50_{det,seg,multi}, lr 5e-4, SGD m=0.9 wd=5e-4.
#
# Usage: scripts/run_multi.sh {train|eval|demo} [multi|det|seg] [extra args...]
set -euo pipefail

MODE=${1:-train}
TASK=${2:-multi}
shift $(( $# >= 2 ? 2 : $# )) || true

NET="resnet-50_${TASK}"
SHAPE="3,512,1024"
MODEL_DIR=${MODEL_DIR:-model}
DATA_ROOT=${DATA_ROOT:-data/cityscapes}   # dir layout or packed {split}.drec

case "$MODE" in
  train)
    python -m dspnet_tpu.cli.multi_train \
      --network "$NET" --data-shape "$SHAPE" --num-classes 8 \
      --batch-size "${BATCH:-1}" --lr 0.0005 --momentum 0.9 --wd 0.0005 \
      --end-epoch "${END_EPOCH:-2000}" --seg-normalize valid \
      --dataset-root "$DATA_ROOT" --model-dir "$MODEL_DIR" \
      --loader "${LOADER:-native}" "$@"
    ;;
  eval)
    python -m dspnet_tpu.cli.multi_eval \
      --network "$NET" --data-shape "$SHAPE" --num-classes 8 \
      --batch-size "${BATCH:-1}" --dataset-root "$DATA_ROOT" \
      --model-dir "$MODEL_DIR" "$@"
    ;;
  demo)
    python -m dspnet_tpu.cli.multi_demo \
      --network "$NET" --data-shape "$SHAPE" \
      --model-dir "$MODEL_DIR" "$@"
    ;;
  *)
    echo "usage: $0 {train|eval|demo} [multi|det|seg] [extra args]" >&2
    exit 1
    ;;
esac
