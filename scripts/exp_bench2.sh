#!/bin/bash
# Benchmark config #2 (BASELINE.md): res 1 (1600x1200), 30k iterations with
# depth+alpha channels, dense synthetic plot; publishes PSNR/SSIM (+LPIPS if
# a weights npz is present) at 7k/30k plus wall time via the reference
# artifact pipeline (render.py -> metrics.py).
# Reference schedule: /root/reference/arguments/__init__.py:73 +
# train_vanilla_3dgs.py:190-193 (test at 7k/30k, save at 7k/30k).
set -e
cd "$(dirname "$0")/.."

SCENE=${SCENE:-/tmp/wheat3dgs_bench2_scene}
MODEL=${MODEL:-/tmp/wheat3dgs_bench2_model}
ITERS=${ITERS:-30000}

if [ ! -f "$SCENE/sparse/0/points3D.bin" ]; then
  python - <<EOF
from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene
make_synthetic_colmap_scene(
    "$SCENE", width=1600, height=1200, n_cams=36, n_heads=32,
    pts_per_head=3000, ground_pts=104000, seed=0, with_masks=False)
EOF
fi

T0=$(date +%s)
# Via the stall watchdog: the remote-TPU tunnel can wedge mid-run; the
# watchdog checkpoints every 1000 iters and auto-resumes from the latest.
python scripts/train_watchdog.py -s "$SCENE" -m "$MODEL" --eval \
  --resolution 1 --iterations "$ITERS" \
  --test_iterations 7000 30000 \
  --save_iterations 7000 15000 "$ITERS" 2>&1 | tail -8
T1=$(date +%s)
echo "train wall: $((T1 - T0)) s"

# Quality dossier via the reference artifact path (render.py -> metrics.py):
# per-view renders + results.json/per_view.json at 7k / 15k / 30k.
for IT in 7000 15000 "$ITERS"; do
  python render.py -m "$MODEL" --iteration "$IT" 2>&1 | tail -2
done
python metrics.py -m "$MODEL" 2>&1 | tail -16
echo "results: $MODEL/results.json"
