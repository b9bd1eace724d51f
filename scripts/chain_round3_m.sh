#!/bin/bash
# Round-3 tail chain (M): quality evals on the vaetf trunk that chain
# L trains in its final slot.  Starts only after chain L logs COMPLETE
# (or its pid dies), so the chip is never contended; every eval output
# is committed the moment it lands (same commit_eval discipline as
# chain K/L — _work/ is gitignored and this VM has been wiped 5x).
#
# Budget: chain L finishes ~21:10; the driver needs the chip back for
# its own bench run at round end, so no new eval launches after
# EVAL_GUARD (21:52 default) and every eval carries its own timeout.
# Priority order mirrors VERDICT "next round" #2/#3/#8:
#   1. uc_sampling @ 30k on the newest vaetf epoch (published validity
#      0.995; round-2 number was 0.977 at 15 epochs)
#   2. interp protocol on the same checkpoint (reference-formula
#      smoothness, published 0.777/0.706)
#   3. model-selection KL sweep across the vaetf epoch run
set -u
cd /root/repo
W=_work/bigrun
CHAIN_L_PID=${CHAIN_L_PID:-1618}
EVAL_GUARD=${EVAL_GUARD:-1787089920}
log() { echo "[chain-m $(date +%H:%M:%S)] $*" | tee -a $W/chain_m.log; }

latest_ep() { ls "$1"/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1; }

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

# ---- wait for chain L to hand the chip back ----
while true; do
  grep -q COMPLETE $W/chain_l.log 2>/dev/null && break
  kill -0 "$CHAIN_L_PID" 2>/dev/null || { log "chain L pid gone"; break; }
  [ "$(date +%s)" -ge "$EVAL_GUARD" ] && { log "guard hit while waiting"; exit 0; }
  sleep 60
done
log "chain L done; starting tail evals"

EP=$(latest_ep $W/run_vaetf512)
if [ -z "${EP:-}" ]; then
  log "no vaetf checkpoints exist; nothing to eval"; exit 0
fi
log "newest vaetf epoch: $EP"

# ---- 1. uc_sampling at the reference's 30k headline scale ----
if [ "$(date +%s)" -lt "$EVAL_GUARD" ]; then
  timeout 1500 python scripts/eval_bigrun.py uc /root/repo/$W "$EP" 30000 \
    > $W/eval_uc_$EP.out 2>&1
  log "uc rc=$? :: $(grep UC_METRICS $W/eval_uc_$EP.out | tail -1 | cut -c1-400)"
  commit_eval "uc_ep$EP" "$W/results_vaetf_$EP" "$W/eval_uc_$EP.out"
fi

# ---- 2. interpolation protocol (reference smoothness formulas) ----
if [ "$(date +%s)" -lt "$EVAL_GUARD" ]; then
  timeout 1200 python scripts/eval_bigrun.py interp /root/repo/$W "$EP" 30 \
    > $W/eval_interp_$EP.out 2>&1
  log "interp rc=$? :: $(grep INTERP_MEAN $W/eval_interp_$EP.out | tail -1)"
  commit_eval "interp_ep$EP" "$W/results_interp_$EP" "$W/eval_interp_$EP.out"
fi

# ---- 3. model-selection KL sweep over the epoch run ----
if [ "$(date +%s)" -lt "$EVAL_GUARD" ]; then
  EPS=$(ls $W/run_vaetf512/model_*.msgpack | sed 's/.*model_//;s/\.msgpack//' \
        | sort -n | awk 'NR % 4 == 1 || NR == 1' | paste -sd,)
  EPS="${EPS:+$EPS,}$EP"
  timeout 1500 python scripts/eval_bigrun.py msel /root/repo/$W "$EP" 3000 "$EPS" \
    > $W/eval_msel.out 2>&1
  log "msel rc=$? :: $(grep MSEL $W/eval_msel.out | tail -1 | cut -c1-400)"
  commit_eval "msel_vaetf" "$W/results_msel" "$W/eval_msel.out"
fi
log "COMPLETE"
