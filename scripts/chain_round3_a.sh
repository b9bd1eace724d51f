#!/bin/bash
# Round-3 chain A: after scavaetf finishes -> pscavaetf training +
# on-chip fused parity probe + sca protocol evals (seen & unseen).
# Evals share the chip with training (measured ~7% decode hit, r2).
set -u
cd /root/repo
W=_work/bigrun

# wait for the scavaetf training process
if [ -f /tmp/train_sca.pid ]; then
  tail --pid="$(cat /tmp/train_sca.pid)" -f /dev/null 2>/dev/null || true
fi
echo "[chain-a] scavaetf done at $(date)" | tee -a $W/chain_a.log

# next training immediately (chip keeps busy)
nohup python scripts/train_bigrun.py pscavaetf /root/repo/$W 16 \
  > $W/train_pscavaetf.out 2>&1 &
echo $! > /tmp/train_psca.pid
echo "[chain-a] pscavaetf launched pid $(cat /tmp/train_psca.pid)" \
  | tee -a $W/chain_a.log

# token-parity probe (contention-immune: asserts tokens, not time)
timeout 2400 python scripts/probe_fused_parity.py 128 \
  > $W/probe_parity.out 2>&1
echo "[chain-a] parity probe rc=$? ($(tail -1 $W/probe_parity.out))" \
  | tee -a $W/chain_a.log

# sca protocol at scale: 100 scaffolds x 2500, seen then unseen
timeout 14400 python scripts/eval_bigrun.py sca /root/repo/$W 16 2500 100 \
  train > $W/eval_sca_seen.out 2>&1
echo "[chain-a] sca seen rc=$? ($(tail -2 $W/eval_sca_seen.out | head -1))" \
  | tee -a $W/chain_a.log
timeout 14400 python scripts/eval_bigrun.py sca /root/repo/$W 16 2500 100 \
  test_scaffolds > $W/eval_sca_unseen.out 2>&1
echo "[chain-a] sca unseen rc=$? ($(tail -2 $W/eval_sca_unseen.out | head -1))" \
  | tee -a $W/chain_a.log
echo "[chain-a] COMPLETE $(date)" | tee -a $W/chain_a.log
