#!/bin/bash
# Tunnel-hang watchdog for background trainers.
#
# The axon tunnel occasionally hangs an RPC: the training process
# stays alive at ~0% CPU in state S and its stdout log stops advancing
# (CLAUDE.md; hit twice on 2026-08-17 ~45 min apart).  Per-epoch
# checkpoints + the persistent compile cache make kill-and-rerun cheap
# (~70 s to first batch), so the watchdog does exactly that:
#
# Every CHECK_S seconds, for each live /tmp/train_{sca,psca,v,pv}.pid:
#   - skip if state T (bench.py SIGSTOPs trainers during the benchmark)
#   - if the process consumed < MIN_TICKS CPU ticks since the last
#     check AND its log file has not grown, kill it and relaunch the
#     same command line (train_bigrun.py resumes from the newest
#     checkpoint), updating the pidfile.
#
# Stop with: kill $(cat /tmp/watchdog.pid)
set -u
cd /root/repo
CHECK_S=${CHECK_S:-90}
MIN_TICKS=${MIN_TICKS:-50}
echo $$ > /tmp/watchdog.pid
declare -A LAST_TICKS LAST_SIZE STRIKES

wlog() { echo "[watchdog $(date +%H:%M:%S)] $*" >> _work/watchdog.log; }

while true; do
  sleep "$CHECK_S"
  for pf in /tmp/train_sca.pid /tmp/train_psca.pid /tmp/train_v.pid \
            /tmp/train_pv.pid; do
    [ -f "$pf" ] || continue
    pid=$(cat "$pf" 2>/dev/null) || continue
    [ -d "/proc/$pid" ] || continue
    state=$(awk '{print $3}' "/proc/$pid/stat" 2>/dev/null) || continue
    [ "$state" = "T" ] && { wlog "$pid paused (bench), skip"; continue; }
    ticks=$(awk '{print $14+$15}' "/proc/$pid/stat" 2>/dev/null) || continue
    # the trainer redirects stdout to a logfile; watch its growth too
    out=$(readlink "/proc/$pid/fd/1" 2>/dev/null || echo "")
    size=0; [ -f "$out" ] && size=$(stat -c %s "$out")
    key="$pf"
    prev_t=${LAST_TICKS[$key]:-}
    prev_s=${LAST_SIZE[$key]:-}
    LAST_TICKS[$key]=$ticks; LAST_SIZE[$key]=$size
    [ -z "$prev_t" ] && continue
    if [ $((ticks - prev_t)) -lt "$MIN_TICKS" ] && [ "$size" = "$prev_s" ]
    then
      STRIKES[$key]=$(( ${STRIKES[$key]:-0} + 1 ))
    else
      STRIKES[$key]=0
    fi
    if [ "${STRIKES[$key]}" -ge 2 ]; then
      # two consecutive stale intervals (~3 min) -> hung: relaunch
      cmd=$(tr '\0' ' ' < "/proc/$pid/cmdline")
      wlog "HANG pid $pid ($pf): $cmd — killing and relaunching"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      sleep 2
      nohup $cmd >> "${out:-/dev/null}" 2>&1 &
      echo $! > "$pf"
      wlog "relaunched as $(cat $pf)"
      STRIKES[$key]=0; unset "LAST_TICKS[$key]" "LAST_SIZE[$key]"
    fi
  done
done
