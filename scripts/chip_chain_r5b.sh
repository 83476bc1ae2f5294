#!/usr/bin/env bash
# Round-5 chip queue, auto-resuming: waits for the axon TPU tunnel, then
# runs the remaining round-5 evidence legs in order (one chip client at
# a time — see memory: only one process may use the chip).
#
#   1. convergence_matrix.py  — resumes from log/convergence_matrix.jsonl
#                               (13/35 entries left: sorted2 seeds 2-4,
#                               hybrid x5, fill x5)
#   2. pipeline_full.py       — the three-stage wall-clock (interrupted
#                               mid-Stage-B last session; reruns fresh)
#   3. rank_pin_ab.py         — f32-pin timing A/B at 127k nodes
#   4. bench.py x2            — fresh same-session driver-format capture
set -u
cd /root/repo

log() { echo "[chain $(date -u +%H:%M:%S)] $*"; }

log "waiting for TPU tunnel..."
until timeout 240 python -c "import jax; print(jax.devices())" 2>/dev/null; do
  log "tunnel still down; retry in 300s"
  sleep 300
done
log "tunnel up"

log "=== leg 1: convergence matrix (resume) ==="
timeout 14400 python scripts/convergence_matrix.py
log "convmat rc=$?"

log "=== leg 2: pipeline wall-clock ==="
timeout 7200 python scripts/pipeline_full.py
log "pipeline rc=$?"

log "=== leg 3: rank f32-pin A/B ==="
timeout 3600 python scripts/rank_pin_ab.py 127000 2000 3
log "pin_ab rc=$?"

log "=== leg 4: bench x2 ==="
timeout 1800 python bench.py
timeout 1800 python bench.py
log "bench rc=$?"
log "CHAIN DONE"
