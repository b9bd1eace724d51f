#!/bin/bash
# Tunnel-hang watchdog for background trainers.
#
# The axon tunnel occasionally hangs an RPC mid-run.  Two variants
# observed (2026-08-17/18): process idle at ~0% CPU, and a client
# busy-spin with CPU hot — in BOTH the stdout log stops advancing, so
# log progress (not CPU ticks: the first watchdog missed a real hang
# because a background thread kept trickling ticks) is the detection
# signal.  Per-epoch checkpoints + the persistent compile cache make
# kill-and-rerun cheap (~70 s to first batch), so the watchdog does
# exactly that.
#
# Every CHECK_S seconds, for each live /tmp/train_{sca,psca,v,pv}.pid:
#   - skip if state T (bench.py SIGSTOPs trainers during benchmarks)
#   - skip if the process is younger than GRACE_S (first AOT compile
#     of a new program is silent for 3-8 min; killing during it would
#     loop forever)
#   - if the log file has not grown for STRIKES_MAX consecutive
#     checks (~4.5-7 min of silence; a full 533 MB checkpoint gather
#     under CPU contention can legitimately take ~4), kill the
#     process and relaunch the same command line (train_bigrun.py
#     resumes from the newest checkpoint), updating the pidfile.
#
# Stop with: kill $(cat /tmp/watchdog.pid)
set -u
cd /root/repo
CHECK_S=${CHECK_S:-90}
# grace must cover a full remote AOT compile chain: observed >12 min
# silent on a cold cache (round 5, 1.5M trainer launch)
GRACE_S=${GRACE_S:-2400}
# 4 strikes x 90 s = 6 min of stale log before a kill: the full
# params+Adam checkpoint gather is silent for up to ~4 min ON TOP of
# the preceding epoch-end step, and a false kill costs a whole epoch
# (round-5 pvaetf incident); a real hang just waits 90 s longer
STRIKES_MAX=${STRIKES_MAX:-4}
echo $$ > /tmp/watchdog.pid
declare -A LAST_SIZE STRIKES

wlog() { echo "[watchdog $(date +%H:%M:%S)] $*" >> _work/watchdog.log; }

proc_age() {  # seconds since process start
  local start_ticks hz uptime
  start_ticks=$(awk '{print $22}' "/proc/$1/stat" 2>/dev/null) || return 1
  hz=$(getconf CLK_TCK)
  uptime=$(awk '{print int($1)}' /proc/uptime)
  echo $(( uptime - start_ticks / hz ))
}

while true; do
  sleep "$CHECK_S"
  for pf in /tmp/train_sca.pid /tmp/train_psca.pid /tmp/train_v.pid \
            /tmp/train_pv.pid; do
    [ -f "$pf" ] || continue
    pid=$(cat "$pf" 2>/dev/null) || continue
    [ -d "/proc/$pid" ] || continue
    state=$(awk '{print $3}' "/proc/$pid/stat" 2>/dev/null) || continue
    [ "$state" = "T" ] && { wlog "$pid paused (bench), skip"; continue; }
    age=$(proc_age "$pid") || continue
    [ "$age" -lt "$GRACE_S" ] && continue
    out=$(readlink "/proc/$pid/fd/1" 2>/dev/null || echo "")
    size=0; [ -f "$out" ] && size=$(stat -c %s "$out")
    key="$pf:$pid"
    prev_s=${LAST_SIZE[$key]:-}
    LAST_SIZE[$key]=$size
    [ -z "$prev_s" ] && continue
    if [ "$size" = "$prev_s" ]; then
      # a full params+Adam checkpoint gather+serialize is silent for
      # 100-240 s (CLAUDE.md); if anything in the trainer's run dir
      # was written in the last 3 min, this is a checkpoint in
      # progress, not a hang (observed false-positive kill of the
      # pvaetf-1.5M trainer at its ep48 full blob, round 5)
      rundir=$(tr '\0' '\n' < "/proc/$pid/cmdline" 2>/dev/null \
               | grep -m1 '^/root/repo/_work/')
      if [ -n "$rundir" ] && [ -n "$(find "$rundir" -maxdepth 2 \
            -name '*.msgpack*' -newermt '-180 seconds' 2>/dev/null \
            | head -1)" ]; then
        wlog "$pid log stale but checkpoint write in progress, skip"
        continue
      fi
      STRIKES[$key]=$(( ${STRIKES[$key]:-0} + 1 ))
      wlog "$pid log stale ($out @ $size bytes, " \
           "strike ${STRIKES[$key]}/$STRIKES_MAX)"
    else
      STRIKES[$key]=0
    fi
    if [ "${STRIKES[$key]:-0}" -ge "$STRIKES_MAX" ]; then
      cmd=$(tr '\0' ' ' < "/proc/$pid/cmdline")
      # preserve the run's GCT_* knobs (free-bits arm, run suffix,
      # fused-ffn gate) across the relaunch
      genv=$(tr '\0' '\n' < "/proc/$pid/environ" 2>/dev/null \
             | grep '^GCT_' | tr '\n' ' ')
      wlog "HANG pid $pid ($pf): $genv$cmd — killing and relaunching"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      sleep 2
      env $genv nohup $cmd >> "${out:-/dev/null}" 2>&1 &
      echo $! > "$pf"
      wlog "relaunched as $(cat $pf)"
      STRIKES[$key]=0
      unset "LAST_SIZE[$key]"
    fi
  done
done
