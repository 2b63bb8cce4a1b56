#!/bin/bash
# Benchmark config #4 at envelope scale (run after exp_seg_envelope.py):
# 360-degree field video with seg overlay (200 frames, elev 45 — the
# reference defaults, /root/reference/run_wheat_3dgs.sh:57-66), per-head
# closeup turntables, and morphology traits over the discovered heads.
set -ex
MODEL=${SEG_MODEL:-/tmp/wheat3dgs_segenv_model}
SCENE=${SEG_SCENE:-/tmp/wheat3dgs_segenv_scene}
EXP=${EXP:-envelope}
REPO="$(cd "$(dirname "$0")/.." && pwd)"

time python "$REPO/render_360.py" -s "$SCENE" -m "$MODEL" --exp_name "$EXP" \
    --render_type field --n_frames "${FRAMES:-200}" --framerate 20 \
    --elevation 45
time python "$REPO/render_360.py" -s "$SCENE" -m "$MODEL" --exp_name "$EXP" \
    --render_type head --n_frames "${HEAD_FRAMES:-100}" --framerate 10 \
    --elevation 30

# Morphology traits over the discovered per-head point clouds (CPU).
OUT=${MORPH_OUT:-/tmp/morph_envelope_results}
mkdir -p "$OUT"
cat > /tmp/morph_envelope3.yaml <<EOF
data_folder: "$MODEL/wheat-head/$EXP/ply/"
output_folder: "$OUT/"
file_format: "ply"
subsampling_threshold: 5000
clusterer_definition:
  type: "hdbscan"
  epsilon: 15
  min_samples: 15
  min_cluster_size: 250
  epsilon_hdbscan: 0.015
sor_parameters:
  k: 200
  std_ratio: 3
splines_smoothing_value: 1
distance_percentile: 99
get_bboxes: true
get_processed_pcd: true
EOF
time python "$REPO/wheatheadsmorphology/main.py" \
    --config /tmp/morph_envelope3.yaml
ls -la "$OUT"
