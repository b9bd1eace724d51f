#!/bin/bash
# Round-3 final chain (H): sequential-solo schedule for the last ~5.5h
# of the round.  Measured today: trainer+eval co-running degrades BOTH
# ~2.5-4x (the rbg/donation train step now saturates the chip), so the
# chain time-slices the chip instead of sharing it:
#   1. scavaetf trains solo until CUT1, then is killed (per-epoch
#      checkpoints make the kill lossless)
#   2. sca protocol on the newest epoch: 100 scaffolds x 2500
#      (VERDICT's asked-for scale; 512-row warmed decode programs
#      chunk any n), seen then unseen (solo ~30 min each)
#   3. SSF-vs-epoch probes (10 scaffolds x 512) on epochs 4/8/12 for
#      the schedule-boundedness curve
#   4. pscavaetf trains solo until CUT2, then killed
#   5. psca protocol: 10 scaffolds x 27 combos x 250, seen
#      (+unseen if clock allows)
# Registers itself as /tmp/train_chain.pid so bench.py's pause guard
# SIGSTOPs the whole tree during the round-end benchmark.
set -u
cd /root/repo
W=_work/bigrun
CUT1=${CUT1:-1787007720}   # 23:02 UTC
CUT2=${CUT2:-1787018100}   # 01:55 UTC
UNSEEN_GUARD=${UNSEEN_GUARD:-1787019900}  # start psca-unseen only before 02:25
echo $$ > /tmp/train_chain.pid
log() { echo "[chain-h $(date +%H:%M:%S)] $*" | tee -a $W/chain_h.log; }

latest_ep() { ls "$1"/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1; }

# ---- 1. scavaetf solo until CUT1 ----
while [ "$(date +%s)" -lt "$CUT1" ]; do
  kill -0 "$(cat /tmp/train_sca.pid 2>/dev/null)" 2>/dev/null || break
  sleep 45
done
if kill -0 "$(cat /tmp/train_sca.pid 2>/dev/null)" 2>/dev/null; then
  kill "$(cat /tmp/train_sca.pid)" 2>/dev/null; sleep 8
  kill -9 "$(cat /tmp/train_sca.pid)" 2>/dev/null
fi
EP=$(latest_ep $W/run_scavaetf512)
log "scavaetf stopped at epoch $EP"
mkdir -p checkpoints
python scripts/export_ckpt.py $W/run_scavaetf512/model_$EP.msgpack \
  checkpoints/scavaetf_620k_ep$EP.msgpack \
  && log "exported checkpoints/scavaetf_620k_ep$EP.msgpack"

# ---- 2. sca protocol seen + unseen ----
timeout 4200 python scripts/eval_bigrun.py sca /root/repo/$W $EP 2500 100 \
  train > $W/eval_sca_seen_$EP.out 2>&1
log "sca seen rc=$? :: $(grep SCA_MEAN $W/eval_sca_seen_$EP.out | tail -1)"
timeout 4200 python scripts/eval_bigrun.py sca /root/repo/$W $EP 2500 100 \
  test_scaffolds > $W/eval_sca_unseen_$EP.out 2>&1
log "sca unseen rc=$? :: $(grep SCA_MEAN $W/eval_sca_unseen_$EP.out | tail -1)"

# ---- 3. SSF-vs-epoch curve ----
for E in 4 8 12; do
  [ "$E" = "$EP" ] && continue
  if [ -f $W/run_scavaetf512/model_$E.msgpack ]; then
    timeout 900 python scripts/eval_bigrun.py sca /root/repo/$W $E 512 10 \
      train > $W/eval_scacurve_$E.out 2>&1
    log "sca curve ep$E rc=$? :: $(grep SCA_MEAN $W/eval_scacurve_$E.out | tail -1)"
  fi
done

# ---- 4. pscavaetf solo until CUT2 ----
nohup python scripts/train_bigrun.py pscavaetf /root/repo/$W 40 \
  > $W/train_pscavaetf.out 2>&1 &
echo $! > /tmp/train_psca.pid
log "pscavaetf launched pid $(cat /tmp/train_psca.pid)"
while [ "$(date +%s)" -lt "$CUT2" ]; do
  kill -0 "$(cat /tmp/train_psca.pid)" 2>/dev/null || break
  sleep 45
done
if kill -0 "$(cat /tmp/train_psca.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_psca.pid)" 2>/dev/null; sleep 8
  kill -9 "$(cat /tmp/train_psca.pid)" 2>/dev/null
fi
EP2=$(latest_ep $W/run_pscavaetf512)
log "pscavaetf stopped at epoch ${EP2:-none}"
if [ -n "${EP2:-}" ]; then
  python scripts/export_ckpt.py $W/run_pscavaetf512/model_$EP2.msgpack \
    checkpoints/pscavaetf_620k_ep$EP2.msgpack \
    && log "exported checkpoints/pscavaetf_620k_ep$EP2.msgpack"

  # ---- 5. psca protocol ----
  timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W $EP2 250 10 \
    train > $W/eval_psca_seen_$EP2.out 2>&1
  log "psca seen rc=$? :: $(grep PSCA_MEAN $W/eval_psca_seen_$EP2.out | tail -1)"
  if [ "$(date +%s)" -lt "$UNSEEN_GUARD" ]; then
    timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W $EP2 250 10 \
      test_scaffolds > $W/eval_psca_unseen_$EP2.out 2>&1
    log "psca unseen rc=$? :: $(grep PSCA_MEAN $W/eval_psca_unseen_$EP2.out | tail -1)"
  fi
fi
log "COMPLETE"
