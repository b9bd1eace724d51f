#!/bin/bash
# Round-3 chain F (final): replaces chains A/E for the endgame.
# Decisions (why this differs from chain E's plan):
#   - psca evals run at EPOCH 12 for both seen and unseen (consistent
#     pair, matches the pvaetf@12 precedent) and start as soon as
#     model_12 exists instead of waiting for model_16 — the remaining
#     wall-clock cannot fit 16-epoch-gated evals.
#   - pvaetf/vaetf schedule resumes are deferred to round 4 (they
#     would contend the chip away from the scaffold-protocol evals,
#     which VERDICT r2 ranked highest-leverage).
#   - a DEADLINE watchdog kills all train/eval pids before the driver
#     runs bench.py, so BENCH_r03 measures a quiet chip.
# All kills are by pidfile, never by pattern.
set -u
cd /root/repo
W=_work/bigrun
DEADLINE_TS=${DEADLINE_TS:-1786999800}   # ~20:50 local
log() { echo "[chain-f] $1 $(date)" | tee -a $W/chain_f.log; }

guard() {  # stop everything at the deadline
  while [ "$(date +%s)" -lt "$DEADLINE_TS" ]; do sleep 60; done
  log "DEADLINE: stopping train/eval jobs for clean bench"
  for f in /tmp/train_psca.pid /tmp/sca_unseen.pid /tmp/psca_seen.pid \
           /tmp/psca_unseen.pid; do
    [ -f "$f" ] && kill "$(cat $f)" 2>/dev/null && log "killed $(basename $f)"
  done
}
guard &
echo $! > /tmp/guard.pid

# ---- lane 1: sca unseen right after sca seen frees its slot ----------
(
  while kill -0 "$(cat /tmp/sca_seen.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
  done
  log "sca seen done ($(grep -c 'INFO \[' $W/eval_sca_seen.out) scaffolds)"
  nohup timeout 13500 python scripts/eval_bigrun.py sca /root/repo/$W 16 \
    2500 100 test_scaffolds > $W/eval_sca_unseen.out 2>&1 &
  echo $! > /tmp/sca_unseen.pid
  log "sca unseen launched pid $(cat /tmp/sca_unseen.pid)"
) &

# ---- lane 2: psca seen+unseen @ epoch 12 -----------------------------
(
  t=0
  while [ ! -f $W/run_pscavaetf512/model_12.msgpack ]; do
    sleep 60; t=$((t+60))
    [ $t -ge 10800 ] && { log "TIMEOUT waiting for pscavaetf@12"; exit 1; }
  done
  sleep 20  # msgpack flush
  log "pscavaetf@12 ready"
  timeout 10800 python scripts/eval_bigrun.py psca /root/repo/$W 12 250 20 \
    train > $W/eval_psca_seen.out 2>&1 &
  echo $! > /tmp/psca_seen.pid
  wait $(cat /tmp/psca_seen.pid)
  log "psca seen rc=$? ($(grep PSCA_MEAN $W/eval_psca_seen.out | tail -1))"
  timeout 9000 python scripts/eval_bigrun.py psca /root/repo/$W 12 250 20 \
    test_scaffolds > $W/eval_psca_unseen.out 2>&1 &
  echo $! > /tmp/psca_unseen.pid
  wait $(cat /tmp/psca_unseen.pid)
  log "psca unseen rc=$? ($(grep PSCA_MEAN $W/eval_psca_unseen.out | tail -1))"
) &

wait
log "COMPLETE"
