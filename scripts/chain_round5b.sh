#!/bin/bash
# Round-5 chain B (after chain_round5a):
#   - launch pscavaetf-nofb continuation training on the 1.5M corpus
#     (VERDICT r4 item 1: the psca validity gap is corpus-bound), with
#     the hang watchdog; protocol evals co-reside on the same chip
#     (the bs=384 headroom is designed for this, train_bigrun.py).
#   - rerun the psca1k seen arm (cells resume at 189/405; the first
#     attempt died to a tunnel backend error).
#   - sca at the reference's 10k/scaffold (VERDICT r4 item 5), seen
#     arm first, then unseen.
set -u
cd /root/repo
W=_work/bigrun
HARD_STOP=${HARD_STOP:-$(( $(date +%s) + 21600 ))}
echo $$ > /tmp/chain_r5b.pid
log() { echo "[chain-r5b $(date +%H:%M:%S)] $*" | tee -a $W/chain_r5.log; }
guard() { [ "$(date +%s)" -lt "$HARD_STOP" ]; }

commit_eval() {
  local tag=$1; shift
  local dst=evidence/bigrun_r5/$tag
  mkdir -p "$dst"
  local d
  for d in "$@"; do
    [ -e "$d" ] || continue
    if [ -d "$d" ]; then
      find "$d" -name 'metric*.csv' -o -name 'record.log' | while read -r f; do
        cp "$f" "$dst/$(basename "$(dirname "$f")")_$(basename "$f")"
      done
    else
      cp "$d" "$dst/"
    fi
  done
  git add "$dst" 2>/dev/null
  git commit -q -m "Protocol results: $tag" -- "$dst" 2>/dev/null \
    && log "committed $tag" || log "commit $tag: nothing new"
}

# ---- wait for chain A and the corpus prep ----
while [ -d "/proc/$(cat /tmp/chain_r5a.pid 2>/dev/null || echo 0)" ]; do
  sleep 60
done
log "chain A finished"
while ! grep -q DONE /tmp/prep15.out 2>/dev/null; do
  sleep 60; guard || exit 0
done
log "corpus prep finished: $(tail -2 /tmp/prep15.out | head -1)"

# ---- launch the 1.5M continuation trainer + watchdog ----
bash scripts/train15.sh pscavaetf 90 _nofb /tmp/train_psca.pid \
  | tee -a $W/chain_r5.log
if ! [ -d "/proc/$(cat /tmp/watchdog.pid 2>/dev/null || echo 0)" ]; then
  nohup bash scripts/hang_watchdog.sh >> _work/watchdog.log 2>&1 &
  log "watchdog started"
fi
if ! [ -d "/proc/$(cat /tmp/insurance.pid 2>/dev/null || echo 0)" ]; then
  nohup bash scripts/ckpt_insurance.sh >> _work/insurance.log 2>&1 &
  log "ckpt insurance started"
fi

# ---- rerun psca1k seen arm (resumes at cell granularity) ----
if guard; then
  export GCT_RUN_SUFFIX=_nofb
  timeout 9000 python scripts/eval_bigrun.py psca /root/repo/$W 73 \
    1000 15 train >> $W/eval_psca1k_train_73.out 2>&1
  log "psca1k nofb train rc=$? :: $(grep -a PSCA_MEAN \
    $W/eval_psca1k_train_73.out | tail -1 | cut -c1-260)"
  commit_eval "psca1k_train_ep73_nofb" \
    "$W/results_pscavaetf_nofb_73_train" "$W/eval_psca1k_train_73.out"
  unset GCT_RUN_SUFFIX
fi

# ---- sca at the reference's FULL 100 scaffolds x 10k, seen arm ----
# (inference.py:66 n_samples=10000, n_scaffolds=100; r3 timing: ~20s
# per 2.5k-scaffold after the one-off compile -> ~2.5-3h at 10k.
# The unseen arm stays at the r3 100x2500 numbers — chip time this
# round goes to the 1.5M-corpus continuation instead.)
for SRC in train; do
  guard || break
  timeout 16000 python scripts/eval_bigrun.py sca /root/repo/$W 48 \
    10000 100 $SRC > $W/eval_sca10k_${SRC}_48.out 2>&1
  log "sca10k $SRC rc=$? :: $(grep -a SCA_MEAN \
    $W/eval_sca10k_${SRC}_48.out | tail -1 | cut -c1-260)"
  commit_eval "sca10k_${SRC}_ep48" \
    "$W/results_scavaetf_48_${SRC}" "$W/eval_sca10k_${SRC}_48.out"
done

log "R5B COMPLETE"
