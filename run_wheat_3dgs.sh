#!/bin/bash
# Full 5-step Wheat3DGS pipeline for one plot (reference: run_wheat_3dgs.sh,
# a SLURM sbatch script; here a plain shell script — on a TPU pod, run one
# plot per host or use wheat3dgs_tpu.parallel to batch plots on one mesh).
#
# Usage: bash run_wheat_3dgs.sh <data_dir> <model_dir> [exp_name] [iou]
set -euo pipefail

DATA_DIR=${1:?usage: run_wheat_3dgs.sh <data_dir> <model_dir> [exp] [iou]}
MODEL_DIR=${2:?}
EXP_NAME=${3:-default}
IOU=${4:-0.6}
ITERS=${ITERS:-15000}

echo "=== 1/5 train vanilla 3DGS ==="
python train_vanilla_3dgs.py -s "$DATA_DIR" -m "$MODEL_DIR" \
  --iterations "$ITERS" --save_iterations 7000 "$ITERS" \
  --test_iterations 7000 "$ITERS"

echo "=== 2/5 render + NVS metrics ==="
python render.py -m "$MODEL_DIR"
python metrics.py -m "$MODEL_DIR"

echo "=== 3/5 3D instance segmentation ==="
python run_3d_seg.py -s "$DATA_DIR" -m "$MODEL_DIR" \
  --exp_name "$EXP_NAME" --iou_threshold "$IOU"

echo "=== 4/5 seg eval + 360 videos ==="
python eval_wheatgs.py -m "$MODEL_DIR" --exp_name "$EXP_NAME"
python render_360.py -m "$MODEL_DIR" --exp_name "$EXP_NAME" \
  --render_type field --n_frames 200 --framerate 20 --elevation 45
python render_360.py -m "$MODEL_DIR" --exp_name "$EXP_NAME" \
  --render_type head --n_frames 100 --framerate 10 --elevation 30

echo "=== 5/5 morphology ==="
python - <<PYEOF
from wheat3dgs_tpu.morphology import run_pipeline
run_pipeline({
    "data_folder": "$MODEL_DIR/wheat-head/$EXP_NAME/ply",
    "output_folder": "$MODEL_DIR/wheat-head/$EXP_NAME/morphology",
    "file_format": "ply", "subsampling_threshold": 5000,
    "clusterer_definition": {"type": "hdbscan", "min_samples": 15,
                             "min_cluster_size": 250,
                             "epsilon_hdbscan": 0.015},
    "sor_parameters": {"k": 200, "std_ratio": 3},
    "splines_smoothing_value": 1, "distance_percentile": 99,
    "get_bboxes": True, "get_processed_pcd": True,
})
PYEOF
echo "pipeline complete: $MODEL_DIR"
