#!/bin/bash
# Wipe insurance: the build VM was reset mid-round three times in
# round 3, losing every uncommitted checkpoint (and with them whole
# training afternoons).  This loop periodically exports the NEWEST
# epoch of each active bigrun training dir to a compact committable
# blob under checkpoints/ and git-commits it (path-limited commit, so
# concurrent code commits from the session are unaffected).
#
# Keeps exactly one insurance export per variant (checkpoints/
# {variant}_620k_latest.msgpack) to bound repo growth; milestone
# exports with epoch-numbered names are made by the chain scripts.
#
# Usage: nohup bash scripts/ckpt_insurance.sh >> _work/insurance.log 2>&1 &
set -u
cd /root/repo
PERIOD=${PERIOD:-2700}
echo $$ > /tmp/insurance.pid

latest_ep() { ls "$1"/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1; }

while true; do
  sleep "$PERIOD"
  for run in _work/bigrun/run_* _work/bigrun15/run_*; do
    [ -d "$run" ] || continue
    variant=$(basename "$run" | sed 's/^run_//;s/512//')
    # corpus tag keeps the 620k and 1.5M arms of a variant separate
    case "$run" in
      _work/bigrun15/*) tag=1p5m ;;
      *) tag=620k ;;
    esac
    ep=$(latest_ep "$run")
    [ -n "$ep" ] || continue
    dst="checkpoints/${variant}_${tag}_latest.msgpack"
    stamp="checkpoints/.${variant}_${tag}_latest_epoch"
    prev=$(cat "$stamp" 2>/dev/null || echo "")
    [ "$prev" = "$ep" ] && continue
    # skip epoch-1-only dirs for a run that just started: the blob is
    # still worth committing (a wipe loses ~7 min otherwise), so no
    if python scripts/export_ckpt.py "$run/model_$ep.msgpack" "$dst" \
         > /dev/null 2>&1; then
      echo "$ep" > "$stamp"
      git add "$dst" "$stamp" 2>/dev/null
      git commit -q -m "Checkpoint insurance: ${variant} epoch ${ep}" \
        -- "$dst" "$stamp" 2>/dev/null \
        && echo "[insurance $(date +%H:%M:%S)] committed $variant ep$ep"
    fi
  done
done
