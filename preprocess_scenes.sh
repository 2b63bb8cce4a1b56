#!/bin/bash
# Run COLMAP SfM on every raw plot folder (reference: preprocess_scenes.sh).
# Each <base>/<plot>/input/ folder of raw images becomes a COLMAP scene.
set -euo pipefail
BASE=${1:?usage: preprocess_scenes.sh <base_dir>}
for plot in "$BASE"/plot_*; do
  [ -d "$plot/input" ] || continue
  echo "=== preprocessing $plot ==="
  python convert.py -s "$plot" --resize
done
