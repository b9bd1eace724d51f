#!/bin/bash
# Round-3 chain E: replaces the A-D pid-chained plan after the
# pscavaetf bs=512 AOT OOM broke chain B/C/D sequencing (dead pid was
# read as "done").  Gates on CHECKPOINT FILES, not pids:
#   1. pscavaetf trains to 16      -> pvaetf resume 13..30 + psca evals
#   2. pvaetf reaches 30           -> vaetf resume 15..40 + psamp@10k
#   3. vaetf reaches 40            -> uc@30k, msel sweep, interp,
#                                     decode/train probes, bench
# sca seen/unseen evals stay with the still-healthy chain A.
set -u
cd /root/repo
W=_work/bigrun
log() { echo "[chain-e] $1 $(date)" | tee -a $W/chain_e.log; }

wait_ckpt() {  # wait_ckpt <file> <train_pidfile> <max_s>
  local f=$1 pidf=$2 max=$3 t=0
  while [ ! -f "$f" ]; do
    sleep 60; t=$((t+60))
    if [ $t -ge $max ]; then log "TIMEOUT waiting for $f"; return 1; fi
    if [ -f "$pidf" ] && ! kill -0 "$(cat $pidf)" 2>/dev/null; then
      sleep 30  # grace: writer may have just exited after the save
      [ -f "$f" ] && break
      log "TRAIN DIED before $f existed"; return 1
    fi
  done
  sleep 15  # let the msgpack writer finish flushing
  return 0
}

# ---- stage 1: pscavaetf 16 epochs ------------------------------------
wait_ckpt $W/run_pscavaetf512/model_16.msgpack /tmp/train_psca.pid 21600 \
  || exit 1
log "pscavaetf@16 ready"

nohup python scripts/train_bigrun.py pvaetf /root/repo/$W 30 \
  > $W/train_pvaetf_resume.out 2>&1 &
echo $! > /tmp/train_pv.pid
log "pvaetf resume launched pid $(cat /tmp/train_pv.pid)"

timeout 14400 python scripts/eval_bigrun.py psca /root/repo/$W 16 250 50 \
  train > $W/eval_psca_seen.out 2>&1
log "psca seen rc=$? ($(tail -2 $W/eval_psca_seen.out | head -1))"
timeout 14400 python scripts/eval_bigrun.py psca /root/repo/$W 16 250 50 \
  test_scaffolds > $W/eval_psca_unseen.out 2>&1
log "psca unseen rc=$? ($(tail -2 $W/eval_psca_unseen.out | head -1))"

# ---- stage 2: pvaetf to 30 -------------------------------------------
wait_ckpt $W/run_pvaetf512/model_30.msgpack /tmp/train_pv.pid 14400 \
  || exit 1
log "pvaetf@30 ready"

nohup python scripts/train_bigrun.py vaetf /root/repo/$W 40 \
  > $W/train_vaetf_resume.out 2>&1 &
echo $! > /tmp/train_v.pid
log "vaetf resume launched pid $(cat /tmp/train_v.pid)"

timeout 21600 python scripts/eval_bigrun.py psamp /root/repo/$W 30 10000 \
  > $W/eval_psamp_30.out 2>&1
log "psamp@10k rc=$? ($(tail -2 $W/eval_psamp_30.out | head -1))"

# ---- stage 3: vaetf to 40 --------------------------------------------
wait_ckpt $W/run_vaetf512/model_40.msgpack /tmp/train_v.pid 18000 \
  || exit 1
log "vaetf@40 ready"

timeout 7200 python scripts/eval_bigrun.py uc /root/repo/$W 40 30000 \
  > $W/eval_uc_40.out 2>&1
log "uc@30k rc=$? ($(grep UC_METRICS $W/eval_uc_40.out | tail -1))"

timeout 10800 python scripts/eval_bigrun.py msel /root/repo/$W 40 3000 \
  5,10,15,20,25,30,35,40 > $W/eval_msel.out 2>&1
log "msel rc=$? ($(grep -o 'best epoch.*' $W/results_msel/model_selection/record.log 2>/dev/null | tail -1))"

timeout 7200 python scripts/eval_bigrun.py interp /root/repo/$W 40 30 \
  > $W/eval_interp.out 2>&1
log "interp rc=$? ($(grep INTERP_MEAN $W/eval_interp.out | tail -1))"

timeout 3600 python scripts/probe_decode_cost.py > $W/probe_decode_r3.out 2>&1
log "decode probe rc=$? ($(tail -1 $W/probe_decode_r3.out))"
timeout 3600 python scripts/probe_train_trace.py > $W/probe_train_trace.out 2>&1
log "train trace rc=$? ($(grep 'step ' $W/probe_train_trace.out | tail -1))"
timeout 3600 python bench.py > $W/bench_r3.out 2>&1
log "bench rc=$? ($(tail -1 $W/bench_r3.out))"
log "COMPLETE"
