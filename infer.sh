#!/usr/bin/env bash
# LERF-mask inference launcher — the reference's infer.sh equivalent
# (render_lerf_mask + IoU/BIoU eval).
set -e
SOURCE=${1:?usage: infer.sh <source_dir> <model_dir> <query_mask.png> [gt_root]}
MODEL=${2:?usage: infer.sh <source_dir> <model_dir> <query_mask.png> [gt_root]}
QUERY=${3:?usage: infer.sh <source_dir> <model_dir> <query_mask.png> [gt_root]}
GT=${4:-}

python "$(dirname "$0")/scripts/render_lerf_mask.py" \
  --source_path "$SOURCE" --model_path "$MODEL" --query_mask "$QUERY"
if [ -n "$GT" ]; then
  python "$(dirname "$0")/scripts/eval_lerf_mask.py" \
    --gt_root "$GT" --pred_root "$MODEL/test_mask"
fi
