#!/bin/bash
# Evaluation-only pass over a trained model (reference: eval.sh — note the
# reference hardcodes a wandb API key at eval.sh:16; we do NOT replicate
# that).  Usage: bash eval.sh <data_dir> <model_dir> [exp_name]
set -euo pipefail
DATA_DIR=${1:?usage: eval.sh <data_dir> <model_dir> [exp]}
MODEL_DIR=${2:?}
EXP_NAME=${3:-default}

python render.py -m "$MODEL_DIR"
python metrics.py -m "$MODEL_DIR"
python eval_wheatgs.py -m "$MODEL_DIR" --exp_name "$EXP_NAME"
