#!/bin/bash
# Round-5 chain E (replaces chain D, which would have idled the TPU
# waiting for the corpus prep before sca10k). Order keeps the chip
# busy through the prep window and launches the 1.5M trainer at a
# chain boundary (no eval in flight — the observed round-5
# FAILED_PRECONDITION came from a client joining mid-eval):
#   1. finish psca1k seen arm            (VERDICT item 1a)
#   2. finish psamp 27x10k tol003        (item 2)
#   3. interp100 greedy                  (item 7)   } fill the
#   4. uc30k full metric suite           (item 4)   } prep window
#   5. wait prep DONE -> pscavaetf-nofb 1.5M trainer + watchdog
#   6. sca 100x10k seen, co-resident     (item 5)
#   7. seed error bars uc/psamp/sca      (item 9)
#   8. stop trainer -> psca probes at the new epoch (1.5M curve)
#   9. pvaetf 1.5M continuation + harvest probe     (item 3)
set -u
cd /root/repo
W=_work/bigrun
W15=_work/bigrun15
HARD_STOP=${HARD_STOP:-$(( $(date +%s) + 29000 ))}
echo $$ > /tmp/chain_r5e.pid
log() { echo "[chain-r5e $(date +%H:%M:%S)] $*" | tee -a $W/chain_r5.log; }
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

# ---- 1. finish psca1k seen arm (nofb ep73); 2 attempts (tunnel) ----
export GCT_RUN_SUFFIX=_nofb
for attempt in 1 2; do
  guard || break
  timeout 10800 python scripts/eval_bigrun.py psca /root/repo/$W 73 \
    1000 15 train >> $W/eval_psca1k_train_73.out 2>&1
  rc=$?
  log "psca1k nofb train attempt$attempt rc=$rc :: $(grep -a PSCA_MEAN \
    $W/eval_psca1k_train_73.out | tail -1 | cut -c1-260)"
  commit_eval "psca1k_train_ep73_nofb" \
    "$W/results_pscavaetf_nofb_73_train" "$W/eval_psca1k_train_73.out"
  [ $rc -eq 0 ] && break
done
unset GCT_RUN_SUFFIX

# ---- 2. finish psamp 27x10k at tol 0.03 ----
for attempt in 1 2; do
  guard || break
  timeout 7200 python scripts/eval_bigrun.py psamp /root/repo/$W 45 10000 \
    >> $W/eval_psamp10k_tol003_45.out 2>&1
  rc=$?
  log "psamp10k tol003 attempt$attempt rc=$rc :: $(grep -a PSAMP_MEAN \
    $W/eval_psamp10k_tol003_45.out | tail -1 | cut -c1-260)"
  commit_eval "psamp_ep45_10k_tol003" "$W/results_pvaetf_45" \
    "$W/eval_psamp10k_tol003_45.out"
  [ $rc -eq 0 ] && break
done

# ---- 3. interpolation at the reference protocol (100 pairs) ----
if guard; then
  timeout 7200 python scripts/eval_bigrun.py interp /root/repo/$W 48 100 \
    > $W/eval_interp100_48.out 2>&1
  log "interp100 rc=$? :: $(grep -a INTERP_MEAN \
    $W/eval_interp100_48.out | tail -1 | cut -c1-260)"
  commit_eval "interp100_ep48_greedy" \
    "$W/results_interp_48g" "$W/eval_interp100_48.out"
fi

# ---- 4. uc30k with the completed metric suite ----
if guard; then
  timeout 7200 python scripts/eval_bigrun.py uc /root/repo/$W 40 30000 \
    > $W/eval_uc30k_40.out 2>&1
  log "uc30k rc=$? :: $(grep -a UC_METRICS \
    $W/eval_uc30k_40.out | tail -1 | cut -c1-320)"
  commit_eval "uc30k_ep40_fullsuite" "$W/results_vaetf_40" \
    "$W/eval_uc30k_40.out"
fi

# ---- 5. wait for the corpus prep, launch the 1.5M trainer ----
while guard && ! grep -q '^DONE' /tmp/prep15.out 2>/dev/null; do
  sleep 60
done
if grep -q '^DONE' /tmp/prep15.out 2>/dev/null; then
  log "corpus prep finished: $(grep -a 'prepared/train.csv' /tmp/prep15.out | tail -1)"
  bash scripts/train15.sh pscavaetf 120 _nofb /tmp/train_psca.pid \
    | tee -a $W/chain_r5.log
  if ! [ -d "/proc/$(cat /tmp/watchdog.pid 2>/dev/null || echo 0)" ]; then
    nohup bash scripts/hang_watchdog.sh >> _work/watchdog.log 2>&1 &
    log "watchdog started"
  fi
  if ! [ -d "/proc/$(cat /tmp/insurance.pid 2>/dev/null || echo 0)" ]; then
    nohup bash scripts/ckpt_insurance.sh >> _work/insurance.log 2>&1 &
    log "ckpt insurance started"
  fi
  # let the trainer's cold AOT compile land before an eval client
  # joins (observed 12-15 min silent on a cold cache)
  sleep 900
else
  log "corpus prep NOT done at guard expiry"
fi

# ---- 6. sca at the reference's FULL 100 scaffolds x 10k, seen ----
for attempt in 1 2; do
  guard || break
  timeout 16000 python scripts/eval_bigrun.py sca /root/repo/$W 48 \
    10000 100 train >> $W/eval_sca10k_train_48.out 2>&1
  rc=$?
  log "sca10k train attempt$attempt rc=$rc :: $(grep -a SCA_MEAN \
    $W/eval_sca10k_train_48.out | tail -1 | cut -c1-260)"
  commit_eval "sca10k_train_ep48" \
    "$W/results_scavaetf_48_train" "$W/eval_sca10k_train_48.out"
  [ $rc -eq 0 ] && break
done

# ---- 7. seed error bars (seeds 11, 13) ----
for SEED in 11 13; do
  guard || break
  export GCT_EVAL_SEED=$SEED
  timeout 3600 python scripts/eval_bigrun.py uc /root/repo/$W 40 10000 \
    > $W/eval_uc10k_s$SEED.out 2>&1
  log "uc10k seed$SEED rc=$? :: $(grep -a UC_METRICS \
    $W/eval_uc10k_s$SEED.out | tail -1 | cut -c1-320)"
  commit_eval "uc10k_ep40_s$SEED" "$W/results_vaetf_40_s$SEED" \
    "$W/eval_uc10k_s$SEED.out"
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

# ---- 8. stop the 1.5M trainer, probe psca at the new epochs ----
if [ -f /tmp/train_psca.pid ] && [ -d "/proc/$(cat /tmp/train_psca.pid)" ]; then
  kill "$(cat /tmp/train_psca.pid)" 2>/dev/null
  rm -f /tmp/train_psca.pid   # watchdog must not resurrect it
  sleep 10
fi
PSCA_EP=$(ls $W15/run_pscavaetf512_nofb/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1)
log "pscavaetf-1.5M stopped at epoch ${PSCA_EP:-none}"
export GCT_RUN_SUFFIX=_nofb
if [ -n "${PSCA_EP:-}" ] && [ "$PSCA_EP" != "73" ]; then
  for SRC in train test_scaffolds; do
    guard || break
    timeout 3600 python scripts/eval_bigrun.py psca /root/repo/$W15 $PSCA_EP \
      250 10 $SRC > $W15/eval_pscaprobe_${SRC}_$PSCA_EP.out 2>&1
    log "psca probe 1.5M ep$PSCA_EP $SRC rc=$? :: $(grep -a PSCA_MEAN \
      $W15/eval_pscaprobe_${SRC}_$PSCA_EP.out | tail -1 | cut -c1-260)"
    commit_eval "b15_pscaprobe_${SRC}_ep$PSCA_EP" \
      "$W15/results_pscavaetf_nofb_${PSCA_EP}_${SRC}" \
      "$W15/eval_pscaprobe_${SRC}_$PSCA_EP.out"
  done
fi
unset GCT_RUN_SUFFIX

# ---- 9. pvaetf 1.5M continuation + harvest probe ----
if guard && [ -f "$W15/prepared/train.csv" ]; then
  bash scripts/train15.sh pvaetf 60 "" /tmp/train_pv.pid \
    | tee -a $W/chain_r5.log
  while guard; do
    PV_EP=$(ls $W15/run_pvaetf512/model_*.msgpack 2>/dev/null \
      | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1)
    [ -n "$PV_EP" ] && [ "$PV_EP" -ge 50 ] && break
    sleep 180
  done
  if [ -f /tmp/train_pv.pid ] && [ -d "/proc/$(cat /tmp/train_pv.pid)" ]; then
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
fi

log "R5E COMPLETE"
