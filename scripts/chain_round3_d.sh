#!/bin/bash
# Round-3 chain D: after vaetf resume finishes -> uc@30k on the
# 40-epoch model + model-selection sweep + perf probes + bench.
set -u
cd /root/repo
W=_work/bigrun

while [ ! -f /tmp/train_v.pid ]; do sleep 30; done
tail --pid="$(cat /tmp/train_v.pid)" -f /dev/null 2>/dev/null || true
echo "[chain-d] vaetf resume done at $(date)" | tee -a $W/chain_d.log

timeout 7200 python scripts/eval_bigrun.py uc /root/repo/$W 40 30000 \
  > $W/eval_uc_40.out 2>&1
echo "[chain-d] uc@30k rc=$? ($(grep UC_METRICS $W/eval_uc_40.out | tail -1))" \
  | tee -a $W/chain_d.log

timeout 7200 python scripts/eval_bigrun.py msel /root/repo/$W 40 3000 \
  5,10,15,20,25,30,35,40 > $W/eval_msel.out 2>&1
echo "[chain-d] msel rc=$? ($(grep -o 'best epoch.*' $W/results_msel/model_selection/record.log 2>/dev/null | tail -1))" \
  | tee -a $W/chain_d.log

timeout 7200 python scripts/eval_bigrun.py interp /root/repo/$W 40 30 \
  > $W/eval_interp.out 2>&1
echo "[chain-d] interp rc=$? ($(grep INTERP_MEAN $W/eval_interp.out | tail -1))" \
  | tee -a $W/chain_d.log

timeout 3600 python scripts/probe_decode_cost.py > $W/probe_decode_r3.out 2>&1
echo "[chain-d] decode probe rc=$? ($(tail -1 $W/probe_decode_r3.out))" \
  | tee -a $W/chain_d.log

timeout 3600 python scripts/probe_train_trace.py > $W/probe_train_trace.out 2>&1
echo "[chain-d] train trace rc=$? ($(grep 'step ' $W/probe_train_trace.out | tail -1))" \
  | tee -a $W/chain_d.log

timeout 3600 python bench.py > $W/bench_r3.out 2>&1
echo "[chain-d] bench rc=$? ($(tail -1 $W/bench_r3.out))" \
  | tee -a $W/chain_d.log
echo "[chain-d] COMPLETE $(date)" | tee -a $W/chain_d.log
