#!/bin/bash
# Round-5 chain C (after chain B's sca10k): the 1.5M continuation
# harvest + remaining verdict items.
#   - stop the pscavaetf-1.5M trainer, probe psca validity at the new
#     epochs (corpus-scaling curve, VERDICT item 1)
#   - pvaetf continuation on 1.5M (VERDICT item 3) + 250/combo probe
#   - interpolation at the reference protocol n_pairs=100 (item 7;
#     batched decode makes this ~25 min)
#   - 3-seed error bars for the cheap probes (item 9)
set -u
cd /root/repo
W=_work/bigrun
W15=_work/bigrun15
HARD_STOP=${HARD_STOP:-$(( $(date +%s) + 21600 ))}
echo $$ > /tmp/chain_r5c.pid
log() { echo "[chain-r5c $(date +%H:%M:%S)] $*" | tee -a $W/chain_r5.log; }
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

# ---- wait for chain B ----
while [ -d "/proc/$(cat /tmp/chain_r5b.pid 2>/dev/null || echo 0)" ]; do
  sleep 120
done
log "chain B finished"

# ---- finish the psamp 27x10k tol-0.03 run (tunnel hang cut it at
# 17/27 combos in chain A; gens are cached, resume is cheap) ----
if guard; then
  timeout 5400 python scripts/eval_bigrun.py psamp /root/repo/$W 45 10000 \
    >> $W/eval_psamp10k_tol003_45.out 2>&1
  log "psamp10k tol003 resume rc=$? :: $(grep -a PSAMP_MEAN \
    $W/eval_psamp10k_tol003_45.out | tail -1 | cut -c1-260)"
  commit_eval "psamp_ep45_10k_tol003" "$W/results_pvaetf_45" \
    "$W/eval_psamp10k_tol003_45.out"
fi

# ---- stop the pscavaetf trainer at its newest full epoch ----
if [ -f /tmp/train_psca.pid ] && [ -d "/proc/$(cat /tmp/train_psca.pid)" ]; then
  kill "$(cat /tmp/train_psca.pid)" 2>/dev/null
  rm -f /tmp/train_psca.pid   # watchdog must not resurrect it
  sleep 10
fi
PSCA_EP=$(ls $W15/run_pscavaetf512_nofb/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1)
log "pscavaetf-1.5M stopped at epoch ${PSCA_EP:-none}"

# ---- psca corpus-scaling probes at the new epochs ----
export GCT_RUN_SUFFIX=_nofb
for EP in $PSCA_EP; do
  [ -n "$EP" ] || continue
  [ "$EP" = "73" ] && continue  # seed epoch == the 620k result
  for SRC in train test_scaffolds; do
    guard || break
    timeout 3600 python scripts/eval_bigrun.py psca /root/repo/$W15 $EP \
      250 10 $SRC > $W15/eval_pscaprobe_${SRC}_$EP.out 2>&1
    log "psca probe 1.5M ep$EP $SRC rc=$? :: $(grep -a PSCA_MEAN \
      $W15/eval_pscaprobe_${SRC}_$EP.out | tail -1 | cut -c1-260)"
    commit_eval "b15_pscaprobe_${SRC}_ep$EP" \
      "$W15/results_pscavaetf_nofb_${EP}_${SRC}" \
      "$W15/eval_pscaprobe_${SRC}_$EP.out"
  done
done
unset GCT_RUN_SUFFIX

# ---- pvaetf continuation on the 1.5M corpus ----
if guard; then
  bash scripts/train15.sh pvaetf 53 "" /tmp/train_pv.pid \
    | tee -a $W/chain_r5.log
fi

# ---- interpolation at the reference protocol shape (100 pairs) ----
if guard; then
  timeout 7200 python scripts/eval_bigrun.py interp /root/repo/$W 48 100 \
    > $W/eval_interp100_48.out 2>&1
  log "interp100 rc=$? :: $(grep -a INTERP_MEAN \
    $W/eval_interp100_48.out | tail -1 | cut -c1-260)"
  commit_eval "interp100_ep48_greedy" \
    "$W/results_interp_48g" "$W/eval_interp100_48.out"
fi

# ---- uc30k with the completed metric suite (VERDICT item 4 at
# flagship scale: TestSF columns, Filters, W1 distances) ----
if guard; then
  timeout 5400 python scripts/eval_bigrun.py uc /root/repo/$W 40 30000 \
    > $W/eval_uc30k_40.out 2>&1
  log "uc30k rc=$? :: $(grep -a UC_METRICS \
    $W/eval_uc30k_40.out | tail -1 | cut -c1-320)"
  commit_eval "uc30k_ep40_fullsuite" "$W/results_vaetf_40" \
    "$W/eval_uc30k_40.out"
fi

# ---- uc seed variance at 10k (seeds 11, 13) ----
for SEED in 11 13; do
  guard || break
  export GCT_EVAL_SEED=$SEED
  timeout 3600 python scripts/eval_bigrun.py uc /root/repo/$W 40 10000 \
    > $W/eval_uc10k_s$SEED.out 2>&1
  log "uc10k seed$SEED rc=$? :: $(grep -a UC_METRICS \
    $W/eval_uc10k_s$SEED.out | tail -1 | cut -c1-320)"
  commit_eval "uc10k_ep40_s$SEED" "$W/results_vaetf_40_s$SEED" \
    "$W/eval_uc10k_s$SEED.out"
  unset GCT_EVAL_SEED
done

# ---- 3-seed error bars: p probe + sca probe (seeds 11, 13) ----
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

# ---- harvest pvaetf: wait for >= ep50, probe at newest epoch ----
while guard; do
  PV_EP=$(ls $W15/run_pvaetf512/model_*.msgpack 2>/dev/null \
    | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1)
  [ -n "$PV_EP" ] && [ "$PV_EP" -ge 50 ] && break
  sleep 180
done
if [ -f /tmp/train_pv.pid ] && [ -d "/proc/$(cat /tmp/train_pv.pid)" ]; then
  # let it finish the current epoch, then stop before the probe
  sleep 60
  kill "$(cat /tmp/train_pv.pid)" 2>/dev/null
  rm -f /tmp/train_pv.pid
  sleep 10
fi
PV_EP=$(ls $W15/run_pvaetf512/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1)
if [ -n "${PV_EP:-}" ] && [ "$PV_EP" != "45" ] && guard; then
  timeout 3600 python scripts/eval_bigrun.py psamp /root/repo/$W15 $PV_EP \
    2500 > $W15/eval_psamp_15m_$PV_EP.out 2>&1
  log "psamp 1.5M ep$PV_EP rc=$? :: $(grep -a PSAMP_MEAN \
    $W15/eval_psamp_15m_$PV_EP.out | tail -1 | cut -c1-260)"
  commit_eval "b15_psamp_ep$PV_EP" "$W15/results_pvaetf_$PV_EP" \
    "$W15/eval_psamp_15m_$PV_EP.out"
fi

log "R5C COMPLETE"
