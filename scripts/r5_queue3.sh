#!/bin/bash
# Round-5 TPU queue, phase 3: dress rehearsal first (VERDICT #1), then the
# genuinely-unrun late-fusion seeds, the 22-eval rank probe, then the
# split-trunk ceiling arms.
#
# Hardening from phases 1-2:
#   * a non-zero recorded rc does NOT count as done (the phase-2 bug:
#     failed markers from the kernel-experiment crash masked seeds 4/5);
#   * a log-silence watchdog kills a job whose log has not grown for
#     12 minutes with one retry — a process whose tunnel handshake lands
#     in a bad backend window hangs forever at its first device contact
#     while fresh processes work (observed twice tonight); every job
#     logs at least every few minutes when healthy.
set -u
cd /root/repo
mkdir -p runs/r5_logs

run_once() {
  local logf="$1"; shift
  "$@" > "$logf" 2>&1 &
  local pid=$!
  (
    while kill -0 "$pid" 2>/dev/null; do
      sleep 120
      local age=$(( $(date +%s) - $(stat -c %Y "$logf" 2>/dev/null || date +%s) ))
      if [ "$age" -gt 720 ]; then
        echo "[watchdog] log silent ${age}s, killing $pid" >> "$logf"
        kill "$pid" 2>/dev/null
        break
      fi
    done
  ) &
  local wd=$!
  wait "$pid"
  local rc=$?
  kill "$wd" 2>/dev/null
  wait "$wd" 2>/dev/null
  return "$rc"
}

run_job() {
  local name="$1"; shift
  if [ -f "runs/r5_logs/${name}.done" ] && \
     grep -q "rc=0" "runs/r5_logs/${name}.done"; then
    echo "[queue3] ${name}: already done rc=0, skipping"
    return 0
  fi
  local rc=1
  for attempt in 1 2; do
    echo "[queue3] ${name}: attempt ${attempt} start $(date +%H:%M:%S)"
    run_once "runs/r5_logs/${name}.log" "$@"
    rc=$?
    [ "$rc" -eq 0 ] && break
    echo "[queue3] ${name}: attempt ${attempt} rc=${rc}"
  done
  echo "rc=${rc}" > "runs/r5_logs/${name}.done"
  echo "[queue3] ${name}: done rc=${rc} $(date +%H:%M:%S)"
}

run_job dress timeout 3000 python scripts/dress_rehearsal.py \
  --workdir runs/r5_dress

for s in 4 5; do
  run_job "sclf_s${s}" timeout 5400 python scripts/quality_run.py \
    --workdir "runs/r5_mcdr48k_sclf_s${s}" --cdrs H1 H2 H3 \
    --steps 48000 --lr 3e-4 --self-conditioning --sc-geometry-only \
    --sc-late-fusion --seed "${s}" --skip-untrained
done

run_job rank22 timeout 2400 python scripts/probe_ranking.py \
  --workdir runs/r4_ckA --fine-tail-22

for s in 0 3; do
  run_job "sctr_s${s}" timeout 7200 python scripts/quality_run.py \
    --workdir "runs/r5_mcdr48k_sctr_s${s}" --cdrs H1 H2 H3 \
    --steps 48000 --lr 3e-4 --self-conditioning --sc-geometry-only \
    --sc-split-trunk --seed "${s}" --skip-untrained
done

echo "[queue3] finished $(date +%H:%M:%S)"
