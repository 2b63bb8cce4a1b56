#!/bin/bash
# Baseline harness: train/eval/render plots 461-467 with fruitnerf via nerfstudio
# (reference: scripts/run_fruitnerf.sh). Requires the nerfstudio CLI (ns-train /
# ns-eval / ns-render) — not bundled in this image; the script checks first.
set -euo pipefail
BASE=${1:?usage: run_fruitnerf.sh <data_base_dir> [output_dir]}
OUT=${2:-outputs}
command -v ns-train >/dev/null || { echo "nerfstudio CLI not found"; exit 1; }
METHOD=fruitnerf
for plot in "$BASE"/plot_*; do
  name=$(basename "$plot")
  echo "=== $METHOD on $name ==="
  ns-train $METHOD --data "$plot" --output-dir "$OUT/$name" \
    --viewer.quit-on-train-completion True nerfstudio-data \
    --train-split-fraction 0.85
  run=$(ls -dt "$OUT/$name/$METHOD"/* | head -1)
  ns-eval --load-config "$run/config.yml" \
    --output-path "$run/test_results.json"
  ns-render dataset --load-config "$run/config.yml" \
    --output-path "$run/renders" --split test
done
python summarize_results.py -b "$OUT" --methods $METHOD
