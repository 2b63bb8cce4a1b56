#!/bin/bash
# Round-3 experiment queue: waits for the remote TPU to come back, then runs
# the two pending REPORT experiments (benchmark config #2, reference-envelope
# segmentation) and a fresh bench.py, each bounded by a timeout so a mid-run
# re-wedge cannot hang the queue forever (training itself is resumed by
# scripts/train_watchdog.py).
#
# Logs: /tmp/round3_queue.log (+ per-step /tmp/{bench2,segenv,bench}_final.txt)
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

log "queue start: waiting for TPU"
wait_tpu
log "TPU recovered"

# HEAD sanity bench FIRST: the moment-form kernel commits landed while the
# TPU was wedged (CPU-validated only); measure them before committing ~1.5h
# of experiments to this code.
log "bench_head start"
timeout 2400 python bench.py > /tmp/bench_head.txt 2>&1
log "bench_head rc=$? $(tail -1 /tmp/bench_head.txt | head -c 200)"

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

log "bench start"
timeout 2400 python bench.py > /tmp/bench_final.txt 2>&1
log "bench rc=$?"
log "queue done"
