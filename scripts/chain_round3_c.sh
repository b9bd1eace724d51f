#!/bin/bash
# Round-3 chain C: after pvaetf resume finishes -> vaetf resume
# (15->40) + the 27-combo p-sampling protocol at 10k/combo on the
# 30-epoch pvaetf.
set -u
cd /root/repo
W=_work/bigrun

while [ ! -f /tmp/train_pv.pid ]; do sleep 30; done
tail --pid="$(cat /tmp/train_pv.pid)" -f /dev/null 2>/dev/null || true
echo "[chain-c] pvaetf resume done at $(date)" | tee -a $W/chain_c.log

nohup python scripts/train_bigrun.py vaetf /root/repo/$W 40 \
  > $W/train_vaetf_resume.out 2>&1 &
echo $! > /tmp/train_v.pid
echo "[chain-c] vaetf resume launched pid $(cat /tmp/train_v.pid)" \
  | tee -a $W/chain_c.log

timeout 21600 python scripts/eval_bigrun.py psamp /root/repo/$W 30 10000 \
  > $W/eval_psamp_30.out 2>&1
echo "[chain-c] psamp@10k rc=$? ($(tail -2 $W/eval_psamp_30.out | head -1))" \
  | tee -a $W/chain_c.log
echo "[chain-c] COMPLETE $(date)" | tee -a $W/chain_c.log
