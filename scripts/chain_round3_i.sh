#!/bin/bash
# Round-3 continuation chain (I): the VM was wiped after chain H
# launched, losing the at-scale sca/psca protocol outputs and the
# vaetf/pvaetf checkpoints.  This chain rebuilds the whole at-scale
# evidence set from the committed artifacts in one time-sliced solo
# schedule (trainer+eval co-running degrades both ~2.5-4x, so the chip
# is strictly time-sliced):
#
#   1. scavaetf resumes from the committed ep12 checkpoint until CUT1
#   2. sca protocol on the newest epoch: 100 scaffolds x 2500,
#      seen then unseen (row-cached, restart-resumable)
#   3. pscavaetf WARM-STARTED from the scavaetf trunk (the reference's
#      own transfer_params recipe) trains until CUT2
#   4. psca protocol: 10 scaffolds x 27 combos x 250, seen
#      (+unseen behind a clock guard)
#   5. vaetf512 trains from scratch until CUT3
#   6. uc protocol @30k + model_selection epoch sweep
#
# Registers /tmp/train_chain.pid so bench.py's pause guard SIGSTOPs
# the whole tree during a benchmark run.
set -u
cd /root/repo
W=_work/bigrun
CUT1=${CUT1:-1787028600}          # 04:50 UTC — stop scavaetf
CUT2=${CUT2:-1787044200}          # 09:10 UTC — stop pscavaetf
CUT3=${CUT3:-1787057700}          # 12:55 UTC — stop vaetf
UNSEEN_GUARD=${UNSEEN_GUARD:-1787049000}   # start psca-unseen before 10:30
MSEL_GUARD=${MSEL_GUARD:-1787059500}       # start msel sweep before 13:25
echo $$ > /tmp/train_chain.pid
log() { echo "[chain-i $(date +%H:%M:%S)] $*" | tee -a $W/chain_i.log; }

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

# ---- 1. scavaetf (already launched by the session) until CUT1 ----
wait_cut /tmp/train_sca.pid "$CUT1"
EP=$(latest_ep $W/run_scavaetf512)
log "scavaetf stopped at epoch $EP"
python scripts/export_ckpt.py $W/run_scavaetf512/model_$EP.msgpack \
  checkpoints/scavaetf_620k_ep$EP.msgpack \
  && log "exported checkpoints/scavaetf_620k_ep$EP.msgpack"

# ---- 2. sca protocol seen + unseen (row-cached => resumable) ----
for SRC in train test_scaffolds; do
  timeout 3300 python scripts/eval_bigrun.py sca /root/repo/$W $EP 2500 100 \
    $SRC > $W/eval_sca_${SRC}_$EP.out 2>&1
  log "sca $SRC rc=$? :: $(grep SCA_MEAN $W/eval_sca_${SRC}_$EP.out | tail -1)"
done

# ---- 3. pscavaetf warm-started from the scavaetf trunk ----
mkdir -p $W/run_pscavaetf512
if [ ! -f $W/run_pscavaetf512/model_$EP.msgpack ]; then
  python scripts/warmstart_ckpt.py \
    checkpoints/scavaetf_620k_ep$EP.msgpack \
    $W/run_pscavaetf512/model_$EP.msgpack \
    scavaetf pscavaetf $W/utils 2>&1 | tail -2 | tee -a $W/chain_i.log
fi
nohup python scripts/train_bigrun.py pscavaetf /root/repo/$W 40 \
  > $W/train_pscavaetf.out 2>&1 &
echo $! > /tmp/train_psca.pid
log "pscavaetf launched pid $(cat /tmp/train_psca.pid) (warm-start ep$EP)"
wait_cut /tmp/train_psca.pid "$CUT2"
EP2=$(latest_ep $W/run_pscavaetf512)
log "pscavaetf stopped at epoch ${EP2:-none}"
if [ -n "${EP2:-}" ] && [ "$EP2" != "$EP" ]; then
  python scripts/export_ckpt.py $W/run_pscavaetf512/model_$EP2.msgpack \
    checkpoints/pscavaetf_620k_ep$EP2.msgpack \
    && log "exported checkpoints/pscavaetf_620k_ep$EP2.msgpack"

  # ---- 4. psca protocol ----
  timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W $EP2 250 10 \
    train > $W/eval_psca_train_$EP2.out 2>&1
  log "psca seen rc=$? :: $(grep PSCA_MEAN $W/eval_psca_train_$EP2.out | tail -1)"
  if [ "$(date +%s)" -lt "$UNSEEN_GUARD" ]; then
    timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W $EP2 250 10 \
      test_scaffolds > $W/eval_psca_test_scaffolds_$EP2.out 2>&1
    log "psca unseen rc=$? :: $(grep PSCA_MEAN $W/eval_psca_test_scaffolds_$EP2.out | tail -1)"
  fi
fi

# ---- 5. vaetf512 from scratch until CUT3 ----
nohup python scripts/train_bigrun.py vaetf /root/repo/$W 40 \
  > $W/train_vaetf.out 2>&1 &
echo $! > /tmp/train_v.pid
log "vaetf launched pid $(cat /tmp/train_v.pid)"
wait_cut /tmp/train_v.pid "$CUT3"
EP3=$(latest_ep $W/run_vaetf512)
log "vaetf stopped at epoch ${EP3:-none}"
if [ -n "${EP3:-}" ]; then
  python scripts/export_ckpt.py $W/run_vaetf512/model_$EP3.msgpack \
    checkpoints/vaetf_620k_ep$EP3.msgpack \
    && log "exported checkpoints/vaetf_620k_ep$EP3.msgpack"

  # ---- 6. uc @30k + msel sweep ----
  timeout 2700 python scripts/eval_bigrun.py uc /root/repo/$W $EP3 30000 \
    > $W/eval_uc_$EP3.out 2>&1
  log "uc rc=$? :: $(grep UC_METRICS $W/eval_uc_$EP3.out | tail -1)"
  if [ "$(date +%s)" -lt "$MSEL_GUARD" ]; then
    EPLIST=$(seq 4 4 "$EP3" | paste -sd, -)
    timeout 1800 python scripts/eval_bigrun.py msel /root/repo/$W $EP3 3000 \
      "$EPLIST" > $W/eval_msel.out 2>&1
    log "msel rc=$? :: $(grep MSEL $W/eval_msel.out | tail -1)"
  fi
fi
log "COMPLETE"
