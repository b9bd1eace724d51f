#!/bin/bash
# Round-3 chain B: after pscavaetf finishes -> pvaetf resume (12->30)
# + psca protocol evals (seen & unseen).
set -u
cd /root/repo
W=_work/bigrun

# wait for chain A to create the pscavaetf pid, then for the process
while [ ! -f /tmp/train_psca.pid ]; do sleep 30; done
tail --pid="$(cat /tmp/train_psca.pid)" -f /dev/null 2>/dev/null || true
echo "[chain-b] pscavaetf done at $(date)" | tee -a $W/chain_b.log

# resume pvaetf 12 -> 30 epochs
nohup python scripts/train_bigrun.py pvaetf /root/repo/$W 30 \
  > $W/train_pvaetf_resume.out 2>&1 &
echo $! > /tmp/train_pv.pid
echo "[chain-b] pvaetf resume launched pid $(cat /tmp/train_pv.pid)" \
  | tee -a $W/chain_b.log

# psca protocol: 10 scaffolds x 27 combos x 250, seen then unseen
timeout 14400 python scripts/eval_bigrun.py psca /root/repo/$W 16 250 50 \
  train > $W/eval_psca_seen.out 2>&1
echo "[chain-b] psca seen rc=$? ($(tail -2 $W/eval_psca_seen.out | head -1))" \
  | tee -a $W/chain_b.log
timeout 14400 python scripts/eval_bigrun.py psca /root/repo/$W 16 250 50 \
  test_scaffolds > $W/eval_psca_unseen.out 2>&1
echo "[chain-b] psca unseen rc=$? ($(tail -2 $W/eval_psca_unseen.out | head -1))" \
  | tee -a $W/chain_b.log
echo "[chain-b] COMPLETE $(date)" | tee -a $W/chain_b.log
