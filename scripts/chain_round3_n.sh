#!/bin/bash
# Round-3 corrected tail chain (N): replaces chains L+M from 15:30.
#
# Why: chain L's pscavaetf trainer died at epoch 41 on a transient
# tunnel RPC error ("remote_compile: response body closed") and
# wait_cut treated the dead pid as "training finished", launching the
# psca protocol on a 1-epoch warm start.  The hang watchdog only
# covers HUNG trainers (log-stale live pids), not crashed ones.  This
# chain wraps every trainer in a relaunch-until-target-or-cut loop
# (train_bigrun.py resumes from the newest per-epoch msgpack, so a
# relaunch costs ~70 s through the warm compile cache).
#
# Schedule (takeover 15:30, driver bench ~22:00):
#   A. pscavaetf resume ep42->52 until CUT2 (18:50)
#   B. psca protocol on the newest epoch: 10 scaffolds x 27 combos
#      x 250, seen (+unseen before UNSEEN_GUARD 20:10)
#   C. vaetf ep31->40 until CUT3 (21:00) — run_vaetf512/model_30 is
#      the committed scavaetf-ep40 trunk remapped by token string
#      (scripts/warmstart_ckpt.py cross-vocab path)
#   D. bench.py prefill (round-end warm cache + recorded numbers)
#   E. tail evals on the newest vaetf: uc@30k, interpolation,
#      model-selection KL sweep (chain M's jobs), each committed on
#      landing, none launched after EVAL_GUARD (21:52)
set -u
cd /root/repo
W=_work/bigrun
CUT2=${CUT2:-1787079000}
UNSEEN_GUARD=${UNSEEN_GUARD:-1787083800}
CUT3=${CUT3:-1787086800}
EVAL_GUARD=${EVAL_GUARD:-1787089920}
echo $$ > /tmp/train_chain.pid
log() { echo "[chain-n $(date +%H:%M:%S)] $*" | tee -a $W/chain_n.log; }

latest_ep() { ls "$1"/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1; }

wait_cut() {  # wait_cut PIDFILE CUT_TS — returns when pid dies or cut
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
    sleep 20   # crash backoff; resume is cheap, hot-looping is not
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
      find "$d" -name '*.csv' -o -name 'record.log' | while read -r f; do
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

# ---- 0. finalized unseen sca aggregate (resume run already done) ----
commit_eval "sca_test_scaffolds_ep40" \
  "$W/results_scavaetf_40_test_scaffolds" \
  "$W/eval_sca_test_scaffolds_40b.out"

# ---- A. pscavaetf to ep52 ----
train_until pscavaetf 52 /tmp/train_psca.pid "$CUT2"
EP2=$(latest_ep $W/run_pscavaetf512)

# ---- B. psca protocol ----
if [ -n "${EP2:-}" ] && [ "$EP2" -gt 41 ]; then
  export_ckpt $W/run_pscavaetf512 "$EP2" pscavaetf
  timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W "$EP2" 250 10 \
    train > $W/eval_psca_train_$EP2.out 2>&1
  log "psca seen rc=$? :: $(grep PSCA_MEAN $W/eval_psca_train_$EP2.out | tail -1)"
  commit_eval "psca_train_ep$EP2" \
    "$W/results_pscavaetf_${EP2}_train" "$W/eval_psca_train_$EP2.out"
  if [ "$(date +%s)" -lt "$UNSEEN_GUARD" ]; then
    timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W "$EP2" 250 10 \
      test_scaffolds > $W/eval_psca_test_scaffolds_$EP2.out 2>&1
    log "psca unseen rc=$? :: $(grep PSCA_MEAN $W/eval_psca_test_scaffolds_$EP2.out | tail -1)"
    commit_eval "psca_test_scaffolds_ep$EP2" \
      "$W/results_pscavaetf_${EP2}_test_scaffolds" \
      "$W/eval_psca_test_scaffolds_$EP2.out"
  fi
else
  log "pscavaetf made no progress past ep41; skipping psca protocol"
fi

# ---- C. vaetf to ep40 (cross-vocab warm start seeded at model_30) ----
train_until vaetf 40 /tmp/train_v.pid "$CUT3"
EP3=$(latest_ep $W/run_vaetf512)
[ -n "${EP3:-}" ] && [ "$EP3" -gt 30 ] && export_ckpt $W/run_vaetf512 "$EP3" vaetf

# ---- D. bench prefill ----
timeout 3000 python bench.py > $W/bench_prefill.json 2> $W/bench_prefill.err
log "bench rc=$? :: $(cat $W/bench_prefill.json)"
commit_eval "bench_prefill" "$W/bench_prefill.json"

# ---- E. tail evals on the newest vaetf ----
if [ -n "${EP3:-}" ] && [ "$EP3" -gt 30 ]; then
  if [ "$(date +%s)" -lt "$EVAL_GUARD" ]; then
    timeout 1500 python scripts/eval_bigrun.py uc /root/repo/$W "$EP3" 30000 \
      > $W/eval_uc_$EP3.out 2>&1
    log "uc rc=$? :: $(grep UC_METRICS $W/eval_uc_$EP3.out | tail -1 | cut -c1-400)"
    commit_eval "uc_ep$EP3" "$W/results_vaetf_$EP3" "$W/eval_uc_$EP3.out"
  fi
  if [ "$(date +%s)" -lt "$EVAL_GUARD" ]; then
    timeout 1200 python scripts/eval_bigrun.py interp /root/repo/$W "$EP3" 30 \
      > $W/eval_interp_$EP3.out 2>&1
    log "interp rc=$? :: $(grep INTERP_MEAN $W/eval_interp_$EP3.out | tail -1)"
    commit_eval "interp_ep$EP3" "$W/results_interp_$EP3" "$W/eval_interp_$EP3.out"
  fi
  if [ "$(date +%s)" -lt "$EVAL_GUARD" ]; then
    EPS=$(ls $W/run_vaetf512/model_*.msgpack | sed 's/.*model_//;s/\.msgpack//' \
          | sort -n | awk 'NR % 3 == 1' | paste -sd,)
    EPS="${EPS:+$EPS,}$EP3"
    timeout 1500 python scripts/eval_bigrun.py msel /root/repo/$W "$EP3" 3000 "$EPS" \
      > $W/eval_msel.out 2>&1
    log "msel rc=$? :: $(grep MSEL $W/eval_msel.out | tail -1 | cut -c1-400)"
    commit_eval "msel_vaetf" "$W/results_msel" "$W/eval_msel.out"
  fi
else
  log "no fine-tuned vaetf epochs; skipping tail evals"
fi
log "COMPLETE"
