#!/bin/bash
# Round-5 TPU queue, phase 5: control (no-sc) seed replicates — the
# min-seed-keyed recipe guidance leans on the control's seed stability,
# which so far rests on one 48k seed (runs/quality_mcdr48k_ctl).
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
  wait "$pid"; local rc=$?
  kill "$wd" 2>/dev/null; wait "$wd" 2>/dev/null
  return "$rc"
}

run_job() {
  local name="$1"; shift
  if [ -f "runs/r5_logs/${name}.done" ] && \
     grep -q "rc=0" "runs/r5_logs/${name}.done"; then
    echo "[queue5] ${name}: already done rc=0, skipping"
    return 0
  fi
  local rc=1
  for attempt in 1 2; do
    echo "[queue5] ${name}: attempt ${attempt} start $(date +%H:%M:%S)"
    run_once "runs/r5_logs/${name}.log" "$@"
    rc=$?
    [ "$rc" -eq 0 ] && break
    echo "[queue5] ${name}: attempt ${attempt} rc=${rc}"
  done
  echo "rc=${rc}" > "runs/r5_logs/${name}.done"
  echo "[queue5] ${name}: done rc=${rc} $(date +%H:%M:%S)"
}

# dress-rehearsal horizon scaling: 0.799 AAR @ 12k steps -> 0.839 @ 36k;
# does the inventory corpus converge toward the quality-gate level?
run_job dress108k timeout 3000 python scripts/dress_rehearsal.py \
  --workdir runs/r5_dress --steps 108000 --tag 108k

for s in 1 2; do
  run_job "ctl_s${s}" timeout 5400 python scripts/quality_run.py \
    --workdir "runs/r5_mcdr48k_ctl_s${s}" --cdrs H1 H2 H3 \
    --steps 48000 --lr 3e-4 --seed "${s}" --skip-untrained
done
echo "[queue5] finished $(date +%H:%M:%S)"
