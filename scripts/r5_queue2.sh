#!/bin/bash
# Round-5 TPU job queue, phase 2: dress rehearsal first (VERDICT #1),
# then the re-runs of the late-fusion seeds that died on the round-5
# kernel experiment (Mosaic two-batch-dim verification error; fixed,
# default now the validated path), then the 22-eval rank probe.
set -u
cd /root/repo
mkdir -p runs/r5_logs

run_job() {
  local name="$1"; shift
  if [ -f "runs/r5_logs/${name}.done" ]; then
    echo "[queue2] ${name}: already done, skipping"
    return 0
  fi
  echo "[queue2] ${name}: start $(date +%H:%M:%S)"
  "$@" > "runs/r5_logs/${name}.log" 2>&1
  local rc=$?
  echo "rc=${rc}" > "runs/r5_logs/${name}.done"
  echo "[queue2] ${name}: done rc=${rc} $(date +%H:%M:%S)"
}

run_job dress timeout 3000 python scripts/dress_rehearsal.py \
  --workdir runs/r5_dress

for s in 4 5; do
  run_job "sclf_s${s}" timeout 5400 python scripts/quality_run.py \
    --workdir "runs/r5_mcdr48k_sclf_s${s}" --cdrs H1 H2 H3 \
    --steps 48000 --lr 3e-4 --self-conditioning --sc-geometry-only \
    --sc-late-fusion --seed "${s}" --skip-untrained
done

# 22-eval fine-tail rank probe against the r4 checkpoint (VERDICT #5)
run_job rank22 timeout 2400 python scripts/probe_ranking.py \
  --workdir runs/r4_ckA --fine-tail-22

# split-trunk sc: the asserted-but-unmeasured ceiling for the late-fusion
# seed spread (0.774-0.999) — full architectural isolation, 2 seeds
for s in 0 3; do
  run_job "sctr_s${s}" timeout 7200 python scripts/quality_run.py \
    --workdir "runs/r5_mcdr48k_sctr_s${s}" --cdrs H1 H2 H3 \
    --steps 48000 --lr 3e-4 --self-conditioning --sc-geometry-only \
    --sc-split-trunk --seed "${s}" --skip-untrained
done

echo "[queue2] finished $(date +%H:%M:%S)"
