#!/bin/bash
# Round-3 chain G: psca evals (seen then unseen) at epoch 12, pinned
# to the proven fused decode path (the megakernel default lands for
# bench/new runs; long protocol evals stay on the path that ran the
# round-2 protocols).  Relaunched after chain F's lane 2 raced the
# model_12.msgpack writer (read mid-flush -> "incomplete input").
set -u
cd /root/repo
W=_work/bigrun
export GCTPLUS_DECODE_PATH=fused
log() { echo "[chain-g] $1 $(date)" | tee -a $W/chain_g.log; }

timeout 10800 python scripts/eval_bigrun.py psca /root/repo/$W 12 250 20 \
  train > $W/eval_psca_seen.out 2>&1
log "psca seen rc=$? ($(grep PSCA_MEAN $W/eval_psca_seen.out | tail -1))"
timeout 9000 python scripts/eval_bigrun.py psca /root/repo/$W 12 250 20 \
  test_scaffolds > $W/eval_psca_unseen.out 2>&1
log "psca unseen rc=$? ($(grep PSCA_MEAN $W/eval_psca_unseen.out | tail -1))"
log "COMPLETE"
