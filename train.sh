#!/usr/bin/env bash
# Training launcher — the reference's train.sh equivalent (which references a
# missing root train.py; ours exists).
set -e
SOURCE=${1:?usage: train.sh <source_dir> <model_dir> [config.json]}
MODEL=${2:?usage: train.sh <source_dir> <model_dir> [config.json]}
CONFIG=${3:-}

ARGS=(-s "$SOURCE" -m "$MODEL")
if [ -n "$CONFIG" ]; then ARGS+=(--config_file "$CONFIG"); fi
python "$(dirname "$0")/train.py" "${ARGS[@]}"
