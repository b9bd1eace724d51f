#!/bin/bash
# Round-3 continuation chain (J): runs after chain I completes.
#   1. interpolation protocol on the newest vaetf checkpoint with the
#      REFERENCE smoothness formulas (the round-3 formula fix landed
#      but its flagship rerun was lost to the VM wipe; published
#      comparables are smooth_start 0.777 / smooth_prev 0.706)
#   2. bench.py — records the round numbers AND prefills the wiped
#      XLA compile cache so the driver's round-end bench run is warm
#   3. pvaetf warm-started from the vaetf trunk (same transfer_params
#      recipe; identical vocab, so everything but the cond heads
#      transfers) trains until the session ends — the insurance loop
#      (scripts/ckpt_insurance.sh) commits its progress.
set -u
cd /root/repo
W=_work/bigrun
echo $$ > /tmp/chain_j.pid
log() { echo "[chain-j $(date +%H:%M:%S)] $*" | tee -a $W/chain_j.log; }

latest_ep() { ls "$1"/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1; }

# ---- wait for chain I ----
while ! grep -q "COMPLETE" $W/chain_i.log 2>/dev/null; do
  kill -0 "$(cat /tmp/train_chain.pid 2>/dev/null)" 2>/dev/null || break
  sleep 60
done
log "chain I finished"

EP=$(latest_ep $W/run_vaetf512)
if [ -n "${EP:-}" ]; then
  # ---- 1. interpolation protocol ----
  timeout 1500 python scripts/eval_bigrun.py interp /root/repo/$W $EP 20 \
    > $W/eval_interp_$EP.out 2>&1
  log "interp rc=$? :: $(grep INTERP_MEAN $W/eval_interp_$EP.out | tail -1)"
fi

# ---- 2. bench (cache prefill + round record) ----
timeout 3000 python bench.py > $W/bench_prefill.json 2> $W/bench_prefill.err
log "bench rc=$? :: $(cat $W/bench_prefill.json)"

# ---- 3. pvaetf warm-started from the vaetf trunk ----
if [ -n "${EP:-}" ]; then
  mkdir -p $W/run_pvaetf512
  if [ -z "$(latest_ep $W/run_pvaetf512)" ]; then
    python scripts/warmstart_ckpt.py \
      $W/run_vaetf512/model_$EP.msgpack \
      $W/run_pvaetf512/model_$EP.msgpack \
      vaetf pvaetf $W/utils 2>&1 | tail -2 | tee -a $W/chain_j.log
  fi
  nohup python scripts/train_bigrun.py pvaetf /root/repo/$W 40 \
    > $W/train_pvaetf.out 2>&1 &
  echo $! > /tmp/train_pv.pid
  log "pvaetf launched pid $(cat /tmp/train_pv.pid) (warm-start ep$EP)"
fi
log "COMPLETE"
