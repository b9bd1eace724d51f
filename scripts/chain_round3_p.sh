#!/bin/bash
# Round-3 chain (P): restart of chain O after the 6th VM wipe killed
# it mid-flight.  Run dirs were re-seeded from the committed compact
# checkpoints (pscavaetf ep52, scavaetf ep40, vaetf ep40, pvaetf
# ep45) by the session; this chain resumes the same schedule:
#   A. pscavaetf ep52 -> 70, then psca probe (10 scaffolds x 27 x
#      250) seen+unseen — validity 0.645/0.540 vs published
#      0.801/0.769 is the largest remaining quality gap; SSF already
#      beats published (0.782/0.663 vs 0.676/0.627).
#   B. vaetf ep40 -> 48, uc@30k (validity 0.9941 vs published 0.995)
#   C. scavaetf ep40 -> 50, sca seen probe (2500 x 100)
# Trainers use the chain-N crash-retry loop (tunnel RPCs die
# transiently; train_bigrun.py resumes from the newest epoch
# msgpack).  The hang watchdog covers the train_{psca,v,sca}.pid
# files; ckpt_insurance.sh (PERIOD=1500) commits the newest epoch of
# every run so a 7th wipe costs at most ~25 min.
set -u
cd /root/repo
W=_work/bigrun
HARD_STOP=${HARD_STOP:-$(( $(date +%s) + 18000 ))}   # +5 h default
echo $$ > /tmp/chain_p.pid
log() { echo "[chain-p $(date +%H:%M:%S)] $*" | tee -a $W/chain_p.log; }

latest_ep() { ls "$1"/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1; }

wait_cut() {  # wait_cut PIDFILE CUT_TS
  while [ "$(date +%s)" -lt "$2" ]; do
    kill -0 "$(cat "$1" 2>/dev/null)" 2>/dev/null || return 0
    sleep 45
  done
  if kill -0 "$(cat "$1" 2>/dev/null)" 2>/dev/null; then
    kill "$(cat "$1")" 2>/dev/null; sleep 8
    kill -9 "$(cat "$1")" 2>/dev/null
  fi
  rm -f "$1"
}

train_until() {  # train_until VARIANT TARGET_EP PIDFILE CUT
  local variant=$1 target=$2 pf=$3 cut=$4 ep tries=0
  while [ "$(date +%s)" -lt "$cut" ]; do
    ep=$(latest_ep "$W/run_${variant}512")
    if [ -n "${ep:-}" ] && [ "$ep" -ge "$target" ]; then break; fi
    tries=$((tries + 1))
    nohup python scripts/train_bigrun.py "$variant" /root/repo/$W \
      "$target" >> "$W/train_$variant.out" 2>&1 &
    echo $! > "$pf"
    log "$variant trainer try $tries pid $(cat $pf) (ep ${ep:-0} -> $target)"
    wait_cut "$pf" "$cut"
    sleep 20
  done
  rm -f "$pf"
  log "$variant training done at epoch $(latest_ep $W/run_${variant}512)"
}

commit_eval() {  # commit_eval TAG FILES...
  local tag=$1; shift
  local dst=evidence/bigrun_r3/$tag
  mkdir -p "$dst"
  local d
  for d in "$@"; do
    [ -e "$d" ] || continue
    if [ -d "$d" ]; then
      find "$d" -name 'metric*.csv' -o -name 'record.log' | while read -r f; do
        cp "$f" "$dst/$(basename "$(dirname "$f")")_$(basename "$f")"
      done
    else
      cp "$d" "$dst/"
    fi
  done
  git add "$dst" 2>/dev/null
  git commit -q -m "Protocol results: $tag" -- "$dst" 2>/dev/null \
    && log "committed $tag" || log "commit $tag: nothing new"
}

export_ckpt() {  # export_ckpt RUN_DIR EP NAME
  python scripts/export_ckpt.py "$1/model_$2.msgpack" \
    "checkpoints/$3_620k_ep$2.msgpack" \
    && git add "checkpoints/$3_620k_ep$2.msgpack" \
    && git commit -q -m "Milestone checkpoint: $3 epoch $2" \
         -- "checkpoints/$3_620k_ep$2.msgpack" \
    && log "exported+committed checkpoints/$3_620k_ep$2.msgpack"
}

guard() { [ "$(date +%s)" -lt "$HARD_STOP" ]; }

# ---- A. pscavaetf ep52 -> 70 + psca probe ----
guard && train_until pscavaetf 70 /tmp/train_psca.pid \
  $(( $(date +%s) + 7200 ))
EP=$(latest_ep $W/run_pscavaetf512)
if [ -n "${EP:-}" ] && [ "$EP" -gt 52 ]; then
  export_ckpt $W/run_pscavaetf512 "$EP" pscavaetf
  for SRC in train test_scaffolds; do
    guard || break
    timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W "$EP" \
      250 10 $SRC > $W/eval_psca_${SRC}_$EP.out 2>&1
    log "psca $SRC rc=$? :: $(grep -a PSCA_MEAN $W/eval_psca_${SRC}_$EP.out | tail -1 | cut -c1-300)"
    commit_eval "psca_${SRC}_ep$EP" \
      "$W/results_pscavaetf_${EP}_${SRC}" "$W/eval_psca_${SRC}_$EP.out"
  done
else
  log "pscavaetf made no progress past 52; skipping psca rerun"
fi

# ---- B. vaetf ep40 -> 48 + uc@30k ----
guard && train_until vaetf 48 /tmp/train_v.pid $(( $(date +%s) + 4200 ))
EP=$(latest_ep $W/run_vaetf512)
if [ -n "${EP:-}" ] && [ "$EP" -gt 40 ]; then
  export_ckpt $W/run_vaetf512 "$EP" vaetf
  if guard; then
    timeout 2400 python scripts/eval_bigrun.py uc /root/repo/$W "$EP" 30000 \
      > $W/eval_uc_$EP.out 2>&1
    log "uc rc=$? :: $(grep -a UC_METRICS $W/eval_uc_$EP.out | tail -1 | cut -c1-300)"
    commit_eval "uc_ep$EP" "$W/results_vaetf_$EP" "$W/eval_uc_$EP.out"
  fi
fi

# ---- C. scavaetf ep40 -> 50 + sca seen probe ----
guard && train_until scavaetf 50 /tmp/train_sca.pid \
  $(( $(date +%s) + 4200 ))
EP=$(latest_ep $W/run_scavaetf512)
if [ -n "${EP:-}" ] && [ "$EP" -gt 40 ]; then
  export_ckpt $W/run_scavaetf512 "$EP" scavaetf
  for SRC in train test_scaffolds; do
    guard || break
    timeout 4500 python scripts/eval_bigrun.py sca /root/repo/$W "$EP" \
      2500 100 $SRC > $W/eval_sca_${SRC}_$EP.out 2>&1
    log "sca $SRC rc=$? :: $(grep -a SCA_MEAN $W/eval_sca_${SRC}_$EP.out | tail -1 | cut -c1-300)"
    commit_eval "sca_${SRC}_ep$EP" \
      "$W/results_scavaetf_${EP}_${SRC}" "$W/eval_sca_${SRC}_$EP.out"
  done
fi
log "COMPLETE"
