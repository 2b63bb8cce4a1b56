#!/bin/bash
# Round-5 final chain: regenerate the envelope run end-to-end and complete
# benchmark config #4 (360-degree videos + morphology) from its artifacts.
# Every stage is resumable/watchdogged; logs to /tmp/round5_final.log.
set -ex
export SEG_SCENE=${SEG_SCENE:-/tmp/wheat3dgs_segenv_scene}
export SEG_MODEL=${SEG_MODEL:-/tmp/wheat3dgs_segenv_model}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

# 1. synth + 15k train (train_watchdog inside; skips if ckpt present)
if [ ! -f "$SEG_MODEL/chkpnt15000.npz" ] && [ ! -d "$SEG_MODEL/point_cloud/iteration_15000" ]; then
    python scripts/exp_seg_envelope.py --skip_seg --seg_wall 0 || true
fi
ls "$SEG_MODEL"

# 2. find-&-match under the seg watchdog (loop-state resume)
T0=$(date +%s)
if [ ! -f "$SEG_MODEL/wheat-head/envelope/gaussians.ply" ]; then
    python scripts/seg_watchdog.py \
        --base "$SEG_MODEL/wheat-head/envelope" --stall_s 1500 -- \
        python run_3d_seg.py -s "$SEG_SCENE" -m "$SEG_MODEL" \
        --exp_name envelope --iou_threshold 0.6
fi
T1=$(date +%s)

# 3. score vs generator ground truth -> envelope_report.json
python scripts/exp_seg_envelope.py --skip_train --skip_seg \
    --seg_wall $((T1 - T0))
cp "$SEG_MODEL/wheat-head/envelope/envelope_report.json" \
   "$REPO/docs/quality/envelope_report.json"

# 4. benchmark config #4: field + head 360 videos, morphology traits
bash scripts/exp_seg360_morph.sh 2>&1 | tee /tmp/seg360_morph.log

# 5. traits of discovered heads vs ground-truth point clouds
python scripts/exp_morph_compare.py | tee /tmp/morph_compare_table.txt

echo "ROUND5_CHAIN_DONE"
