#!/bin/bash
# Round-5 TPU job queue: sequential jobs on the one tunneled chip.
# Each job logs to runs/r5_logs/<name>.log; a job failure does not stop
# the queue (later jobs are independent measurements).
set -u
cd /root/repo
mkdir -p runs/r5_logs

run_job() {
  local name="$1"; shift
  if [ -f "runs/r5_logs/${name}.done" ]; then
    echo "[queue] ${name}: already done, skipping"
    return 0
  fi
  echo "[queue] ${name}: start $(date +%H:%M:%S)"
  "$@" > "runs/r5_logs/${name}.log" 2>&1
  local rc=$?
  echo "rc=${rc}" > "runs/r5_logs/${name}.done"
  echo "[queue] ${name}: done rc=${rc} $(date +%H:%M:%S)"
}

# --- late-fusion sc seed hardening (VERDICT task 3): seeds 3,4,5 of the
# r4 recipe (48k @ 3e-4, H1+H2+H3, geometry-only late-fusion sc)
for s in 3 4 5; do
  run_job "sclf_s${s}" timeout 5400 python scripts/quality_run.py \
    --workdir "runs/r5_mcdr48k_sclf_s${s}" --cdrs H1 H2 H3 \
    --steps 48000 --lr 3e-4 --self-conditioning --sc-geometry-only \
    --sc-late-fusion --seed "${s}" --skip-untrained
done

echo "[queue] seed block finished $(date +%H:%M:%S)"
