#!/bin/bash
# Round-5 chain F — endgame reprioritization (replaces chain E's tail
# after sca10k): the 1.5M psca scaling probes are the round's #1
# deliverable and must not be starved by the seed-variance block, so
# they run FIRST, co-resident with the still-running 1.5M trainer
# (the supported concurrency pattern) instead of after stopping it.
#   1. psca probes (10x27x250, both sources) at the newest FULLY
#      WRITTEN 1.5M epoch (newest-1 while the trainer is mid-epoch)
#   2. seed error bars: psamp250 + sca1k at seeds 11/13
#   3. uc10k seeds 11/13 (if time)
#   4. stop the trainer; probe the final epoch (train source, if time)
#   5. BLHD attention A/B probe (pauses the trainer grace-free since
#      it is already stopped)
set -u
cd /root/repo
W=_work/bigrun
W15=_work/bigrun15
HARD_STOP=${HARD_STOP:-$(( $(date +%s) + 12600 ))}
echo $$ > /tmp/chain_r5f.pid
log() { echo "[chain-r5f $(date +%H:%M:%S)] $*" | tee -a $W/chain_r5.log; }
guard() { [ "$(date +%s)" -lt "$HARD_STOP" ]; }

commit_eval() {
  local tag=$1; shift
  local dst=evidence/bigrun_r5/$tag
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

newest_ep() { ls "$1"/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1; }

# ---- 1. psca probes at the newest fully-written 1.5M epoch ----
EP=$(newest_ep $W15/run_pscavaetf512_nofb)
if [ -n "${EP:-}" ] && [ -d "/proc/$(cat /tmp/train_psca.pid 2>/dev/null || echo 0)" ]; then
  EP=$((EP - 1))   # newest may still be the in-flight epoch's target
fi
export GCT_RUN_SUFFIX=_nofb
if [ -n "${EP:-}" ] && [ "$EP" -gt 73 ]; then
  for SRC in train test_scaffolds; do
    guard || break
    timeout 4500 python scripts/eval_bigrun.py psca /root/repo/$W15 $EP \
      250 10 $SRC > $W15/eval_pscaprobe_${SRC}_$EP.out 2>&1
    log "psca probe 1.5M ep$EP $SRC rc=$? :: $(grep -a PSCA_MEAN \
      $W15/eval_pscaprobe_${SRC}_$EP.out | tail -1 | cut -c1-300)"
    commit_eval "b15_pscaprobe_${SRC}_ep$EP" \
      "$W15/results_pscavaetf_nofb_${EP}_${SRC}" \
      "$W15/eval_pscaprobe_${SRC}_$EP.out"
  done
else
  log "no 1.5M epoch beyond 73 yet (EP=${EP:-none})"
fi
unset GCT_RUN_SUFFIX

# ---- 2. seed error bars: psamp250 + sca1k (seeds 11, 13) ----
for SEED in 11 13; do
  guard || break
  export GCT_EVAL_SEED=$SEED
  timeout 2400 python scripts/eval_bigrun.py psamp /root/repo/$W 45 250 \
    > $W/eval_psamp250_s$SEED.out 2>&1
  log "psamp250 seed$SEED rc=$? :: $(grep -a PSAMP_MEAN \
    $W/eval_psamp250_s$SEED.out | tail -1 | cut -c1-220)"
  commit_eval "psamp250_ep45_s$SEED" "$W/results_pvaetf_45_s$SEED" \
    "$W/eval_psamp250_s$SEED.out"
  timeout 2400 python scripts/eval_bigrun.py sca /root/repo/$W 48 \
    1000 10 train > $W/eval_sca1k_s$SEED.out 2>&1
  log "sca1k seed$SEED rc=$? :: $(grep -a SCA_MEAN \
    $W/eval_sca1k_s$SEED.out | tail -1 | cut -c1-220)"
  commit_eval "sca1k_ep48_s$SEED" "$W/results_scavaetf_48_s$SEED" \
    "$W/eval_sca1k_s$SEED.out"
  unset GCT_EVAL_SEED
done

# ---- 3. uc10k seeds (only if time allows) ----
for SEED in 11 13; do
  guard || break
  export GCT_EVAL_SEED=$SEED
  timeout 2700 python scripts/eval_bigrun.py uc /root/repo/$W 40 10000 \
    > $W/eval_uc10k_s$SEED.out 2>&1
  log "uc10k seed$SEED rc=$? :: $(grep -a UC_METRICS \
    $W/eval_uc10k_s$SEED.out | tail -1 | cut -c1-320)"
  commit_eval "uc10k_ep40_s$SEED" "$W/results_vaetf_40_s$SEED" \
    "$W/eval_uc10k_s$SEED.out"
  unset GCT_EVAL_SEED
done

# ---- 4. stop the trainer; final-epoch probe if time ----
if [ -f /tmp/train_psca.pid ] && [ -d "/proc/$(cat /tmp/train_psca.pid)" ]; then
  kill "$(cat /tmp/train_psca.pid)" 2>/dev/null
  rm -f /tmp/train_psca.pid
  sleep 10
fi
FEP=$(newest_ep $W15/run_pscavaetf512_nofb)
log "pscavaetf-1.5M stopped at epoch ${FEP:-none}"
export GCT_RUN_SUFFIX=_nofb
if [ -n "${FEP:-}" ] && [ "$FEP" != "${EP:-}" ] && [ "$FEP" -gt 73 ] && guard; then
  timeout 3600 python scripts/eval_bigrun.py psca /root/repo/$W15 $FEP \
    250 10 train > $W15/eval_pscaprobe_train_$FEP.out 2>&1
  log "psca probe 1.5M ep$FEP train rc=$? :: $(grep -a PSCA_MEAN \
    $W15/eval_pscaprobe_train_$FEP.out | tail -1 | cut -c1-300)"
  commit_eval "b15_pscaprobe_train_ep$FEP" \
    "$W15/results_pscavaetf_nofb_${FEP}_train" \
    "$W15/eval_pscaprobe_train_$FEP.out"
fi
unset GCT_RUN_SUFFIX

# ---- 5. BLHD attention layout A/B (chip is free now) ----
timeout 2400 python scripts/probe_blhd_ab.py 512 80 \
  > $W/probe_blhd_ab.out 2>&1
log "blhd A/B rc=$? :: $(grep -a 'attn_blhd=' $W/probe_blhd_ab.out \
  | tr '\n' ' ' | cut -c1-300)"
cp $W/probe_blhd_ab.out evidence/bigrun_r5/ 2>/dev/null
git add evidence/bigrun_r5/probe_blhd_ab.out 2>/dev/null
git commit -q -m "Probe: BLHD attention layout on-chip A/B" \
  -- evidence/bigrun_r5/probe_blhd_ab.out 2>/dev/null || true

log "R5F COMPLETE"
