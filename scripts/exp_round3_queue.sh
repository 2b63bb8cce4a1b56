#!/bin/bash
# Round-3 experiment queue: waits for the remote TPU to come back, then
#   1. A/Bs the moment-form kernels (landed during the wedge, CPU-validated
#      only) against the direct-VPU variant via WHEAT3DGS_MOMENT_KERNELS,
#      and applies the faster default to the working tree,
#   2. runs the two pending REPORT experiments (benchmark config #2,
#      reference-envelope segmentation),
#   3. splices results into docs/REPORT.md (scripts/fill_report.py) and
#      takes a final bench snapshot.
# Every step is timeout-bounded so a mid-run re-wedge cannot hang the queue
# (training itself is resumed by scripts/train_watchdog.py).
#
# Logs: /tmp/round3_queue.log (+ per-step /tmp/{bench_head,bench_vpu,
# bench2,segenv,bench}_*.txt)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round3_queue.log

log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

wait_tpu() {
  while true; do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jnp.ones((256,256)) @ jnp.ones((256,256)))" \
        >/dev/null 2>&1; then
      return 0
    fi
    log "tpu still wedged"
    sleep 60
  done
}

# Last {"metric": ...} JSON line of a bench log -> the "value" field, or -1.
bench_value() {
  python - "$1" <<'EOF'
import json, sys
val = -1.0
try:
    for line in open(sys.argv[1]):
        line = line.strip()
        if line.startswith('{"metric"'):
            val = json.loads(line).get("value", -1.0)
except OSError:
    pass
print(val)
EOF
}

log "queue start: waiting for TPU"
wait_tpu
log "TPU recovered"

# --- 1. HEAD bench (kernel A/B already decided + committed: 1e4a893) ----
# Validates the newest perf-relevant commits (analytic SSIM backward) on
# chip BEFORE committing hours to the long experiments; a regression here
# is caught in ~20 min instead of discovered after bench2.
if [ "${SKIP_HEAD_BENCH:-0}" != 1 ]; then
  log "bench_head start"
  timeout 2400 python bench.py > /tmp/bench_head.txt 2>&1
  log "bench_head rc=$? $(tail -1 /tmp/bench_head.txt | head -c 200)"
fi

# --- 2. the two pending REPORT experiments -------------------------------
if [ ! -f /tmp/wheat3dgs_bench2_model/results.json ] || \
   [ "${FORCE_BENCH2:-1}" = 1 ]; then
  log "bench2 start"
  rm -rf /tmp/wheat3dgs_bench2_model
  timeout 10800 bash scripts/exp_bench2.sh > /tmp/bench2_final.txt 2>&1
  log "bench2 rc=$?"
fi

log "segenv start"
timeout 7200 python scripts/exp_seg_envelope.py > /tmp/segenv_final.txt 2>&1
log "segenv rc=$?"

# Envelope-scale 360 field video + morphology traits (BASELINE config #4)
# on the segmented model, if the seg produced its artifact tree.
if [ -d /tmp/wheat3dgs_segenv_model/wheat-head/envelope/ply ]; then
  log "seg360 start"
  timeout 1800 python render_360.py -m /tmp/wheat3dgs_segenv_model \
      --exp_name envelope --render_type field --n_frames 60 \
      > /tmp/seg360.txt 2>&1
  log "seg360 rc=$?"
  cat > /tmp/morph_envelope.yaml <<EOF
data_folder: "/tmp/wheat3dgs_segenv_model/wheat-head/envelope/ply/"
output_folder: "/tmp/morph_envelope_results/"
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
  log "morphology start"
  timeout 1800 python wheatheadsmorphology/main.py \
      -c /tmp/morph_envelope.yaml > /tmp/morph_envelope.txt 2>&1
  log "morphology rc=$?"
fi

# --- 3. final snapshot, then splice everything into docs/REPORT.md -------
log "bench start"
timeout 2400 python bench.py > /tmp/bench_final.txt 2>&1
log "bench rc=$? $(tail -1 /tmp/bench_final.txt | head -c 200)"

log "fill_report start"
timeout 600 python scripts/fill_report.py > /tmp/fill_report.txt 2>&1
log "fill_report rc=$?"
log "queue done"
