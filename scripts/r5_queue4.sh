#!/bin/bash
# Round-5 TPU queue, phase 4: the longer-horizon dress arm (the 12k run is
# under-trained relative to the quality gate: 46 epochs over 8.3k patches
# vs 873 over 440) and the post-fat-dot re-profile that closes the
# roofline story with measured per-op numbers.
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
    echo "[queue4] ${name}: already done rc=0, skipping"
    return 0
  fi
  local rc=1
  for attempt in 1 2; do
    echo "[queue4] ${name}: attempt ${attempt} start $(date +%H:%M:%S)"
    run_once "runs/r5_logs/${name}.log" "$@"
    rc=$?
    [ "$rc" -eq 0 ] && break
    echo "[queue4] ${name}: attempt ${attempt} rc=${rc}"
  done
  echo "rc=${rc}" > "runs/r5_logs/${name}.done"
  echo "[queue4] ${name}: done rc=${rc} $(date +%H:%M:%S)"
}

run_job dress36k timeout 3000 python scripts/dress_rehearsal.py \
  --workdir runs/r5_dress --steps 36000 --tag 36k

run_job profile_r5 timeout 2400 python scripts/profile_steady_state.py \
  --out runs/profile_r5

echo "[queue4] finished $(date +%H:%M:%S)"
