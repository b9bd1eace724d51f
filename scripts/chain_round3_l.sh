#!/bin/bash
# Round-3 continuation chain (L): chain K's schedule, relaunched after
# the FIFTH VM wipe, again from the committed scavaetf ep25 insurance
# blob (the previous session was cut before CUT1, so no protocol evals
# ran).  Identical to chain K apart from fresh cut timestamps, an ep25
# fallback to the `latest` insurance blob in step 2b, and a cold
# compile cache (step 1 pays ~10-20 min of AOT compiles).
# Chain K deltas retained:
#   - every protocol eval's metric CSVs are copied into evidence/ and
#     git-committed the moment the eval finishes (the round lost the
#     at-scale sca/psca outputs to wipes TWICE; _work/ is gitignored)
#   - adds the SSF-vs-epoch probes on ep12/ep25 (milestone blobs in
#     checkpoints/) for the schedule-boundedness curve
# The chip is strictly time-sliced (trainer+eval co-running degrades
# both ~2.5-4x, measured in round 3).
#
# Schedule (session start 10:23 UTC, assumed ~12h -> ends 22:23):
#   1. scavaetf resumes ep26->40 until CUT1 (14:00)
#   2. sca protocol on the newest epoch: 100 scaffolds x 2500,
#      seen then unseen; SSF-vs-epoch probes on 12/25
#   3. pscavaetf warm-started from the scavaetf trunk until CUT2 (18:50)
#   4. psca protocol: 10 scaffolds x 27 combos x 250, seen
#      (+unseen before UNSEEN_GUARD 20:10)
#   5. vaetf512 from scratch until CUT3 (21:00) — insurance commits its
#      epochs for round 4
#   6. bench.py prefill (round-end warm cache + recorded numbers)
# Registers /tmp/train_chain.pid so bench.py's pause guard SIGSTOPs
# the whole tree during a benchmark run.
set -u
cd /root/repo
W=_work/bigrun
CUT1=${CUT1:-1787061600}
CUT2=${CUT2:-1787079000}
UNSEEN_GUARD=${UNSEEN_GUARD:-1787083800}
CUT3=${CUT3:-1787086800}
echo $$ > /tmp/train_chain.pid
log() { echo "[chain-l $(date +%H:%M:%S)] $*" | tee -a $W/chain_l.log; }

latest_ep() { ls "$1"/model_*.msgpack 2>/dev/null \
  | sed 's/.*model_//;s/\.msgpack//' | sort -n | tail -1; }

wait_cut() {  # wait_cut PIDFILE CUT_TS
  while [ "$(date +%s)" -lt "$2" ]; do
    kill -0 "$(cat "$1" 2>/dev/null)" 2>/dev/null || return 0
    sleep 45
  done
  if kill -0 "$(cat "$1" 2>/dev/null)" 2>/dev/null; then
    kill "$(cat "$1")" 2>/dev/null; sleep 8
    kill -9 "$(cat "$1")" 2>/dev/null
  fi
  rm -f "$1"
}

commit_eval() {  # commit_eval TAG SRCDIR... — snapshot eval outputs into git
  local tag=$1; shift
  local dst=evidence/bigrun_r3/$tag
  mkdir -p "$dst"
  local d
  for d in "$@"; do
    [ -e "$d" ] || continue
    if [ -d "$d" ]; then
      find "$d" -name '*.csv' -o -name 'record.log' | while read -r f; do
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

# ---- 1. scavaetf (already launched by the session) until CUT1 ----
wait_cut /tmp/train_sca.pid "$CUT1"
EP=$(latest_ep $W/run_scavaetf512)
log "scavaetf stopped at epoch $EP"
python scripts/export_ckpt.py $W/run_scavaetf512/model_$EP.msgpack \
  checkpoints/scavaetf_620k_ep$EP.msgpack \
  && git add checkpoints/scavaetf_620k_ep$EP.msgpack \
  && git commit -q -m "Milestone checkpoint: scavaetf epoch $EP" \
       -- checkpoints/scavaetf_620k_ep$EP.msgpack \
  && log "exported+committed checkpoints/scavaetf_620k_ep$EP.msgpack"

# ---- 2. sca protocol seen + unseen (row-cached => resumable) ----
for SRC in train test_scaffolds; do
  timeout 3600 python scripts/eval_bigrun.py sca /root/repo/$W $EP 2500 100 \
    $SRC > $W/eval_sca_${SRC}_$EP.out 2>&1
  log "sca $SRC rc=$? :: $(grep SCA_MEAN $W/eval_sca_${SRC}_$EP.out | tail -1)"
  commit_eval "sca_${SRC}_ep$EP" \
    "$W/results_scavaetf_${EP}_${SRC}" "$W/eval_sca_${SRC}_$EP.out"
done

# ---- 2b. SSF-vs-epoch probes on the milestone checkpoints ----
for E in 12 25; do
  [ "$E" = "$EP" ] && continue
  if [ ! -f $W/run_scavaetf512/model_$E.msgpack ] \
     && [ -f checkpoints/scavaetf_620k_ep$E.msgpack ]; then
    cp checkpoints/scavaetf_620k_ep$E.msgpack \
       $W/run_scavaetf512/model_$E.msgpack
  fi
  if [ -f $W/run_scavaetf512/model_$E.msgpack ]; then
    timeout 1200 python scripts/eval_bigrun.py sca /root/repo/$W $E 512 10 \
      train > $W/eval_scacurve_$E.out 2>&1
    log "sca curve ep$E rc=$? :: $(grep SCA_MEAN $W/eval_scacurve_$E.out | tail -1)"
    commit_eval "scacurve_ep$E" \
      "$W/results_scavaetf_${E}_train" "$W/eval_scacurve_$E.out"
  fi
done

# ---- 3. pscavaetf warm-started from the scavaetf trunk ----
mkdir -p $W/run_pscavaetf512
if [ -z "$(latest_ep $W/run_pscavaetf512)" ]; then
  python scripts/warmstart_ckpt.py \
    $W/run_scavaetf512/model_$EP.msgpack \
    $W/run_pscavaetf512/model_$EP.msgpack \
    scavaetf pscavaetf $W/utils 2>&1 | tail -2 | tee -a $W/chain_k.log
fi
# train EP+12 epochs on top of the trunk (reference transfer recipe
# trains ~10; chain-K passed a fixed 40, which is a no-op when the
# trunk already reached 40 and then skips the psca protocol via the
# EP2!=EP guard)
nohup python scripts/train_bigrun.py pscavaetf /root/repo/$W $((EP + 12)) \
  > $W/train_pscavaetf.out 2>&1 &
echo $! > /tmp/train_psca.pid
log "pscavaetf launched pid $(cat /tmp/train_psca.pid) (warm-start ep$EP)"
wait_cut /tmp/train_psca.pid "$CUT2"
EP2=$(latest_ep $W/run_pscavaetf512)
log "pscavaetf stopped at epoch ${EP2:-none}"
if [ -n "${EP2:-}" ] && [ "$EP2" != "$EP" ]; then
  python scripts/export_ckpt.py $W/run_pscavaetf512/model_$EP2.msgpack \
    checkpoints/pscavaetf_620k_ep$EP2.msgpack \
    && git add checkpoints/pscavaetf_620k_ep$EP2.msgpack \
    && git commit -q -m "Milestone checkpoint: pscavaetf epoch $EP2" \
         -- checkpoints/pscavaetf_620k_ep$EP2.msgpack \
    && log "exported+committed checkpoints/pscavaetf_620k_ep$EP2.msgpack"

  # ---- 4. psca protocol ----
  timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W $EP2 250 10 \
    train > $W/eval_psca_train_$EP2.out 2>&1
  log "psca seen rc=$? :: $(grep PSCA_MEAN $W/eval_psca_train_$EP2.out | tail -1)"
  commit_eval "psca_train_ep$EP2" \
    "$W/results_pscavaetf_${EP2}_train" "$W/eval_psca_train_$EP2.out"
  if [ "$(date +%s)" -lt "$UNSEEN_GUARD" ]; then
    timeout 2700 python scripts/eval_bigrun.py psca /root/repo/$W $EP2 250 10 \
      test_scaffolds > $W/eval_psca_test_scaffolds_$EP2.out 2>&1
    log "psca unseen rc=$? :: $(grep PSCA_MEAN $W/eval_psca_test_scaffolds_$EP2.out | tail -1)"
    commit_eval "psca_test_scaffolds_ep$EP2" \
      "$W/results_pscavaetf_${EP2}_test_scaffolds" \
      "$W/eval_psca_test_scaffolds_$EP2.out"
  fi
fi

# ---- 5. vaetf512 from scratch until CUT3 ----
nohup python scripts/train_bigrun.py vaetf /root/repo/$W 40 \
  > $W/train_vaetf.out 2>&1 &
echo $! > /tmp/train_v.pid
log "vaetf launched pid $(cat /tmp/train_v.pid)"
wait_cut /tmp/train_v.pid "$CUT3"
EP3=$(latest_ep $W/run_vaetf512)
log "vaetf stopped at epoch ${EP3:-none}"
if [ -n "${EP3:-}" ]; then
  python scripts/export_ckpt.py $W/run_vaetf512/model_$EP3.msgpack \
    checkpoints/vaetf_620k_ep$EP3.msgpack \
    && git add checkpoints/vaetf_620k_ep$EP3.msgpack \
    && git commit -q -m "Milestone checkpoint: vaetf epoch $EP3" \
         -- checkpoints/vaetf_620k_ep$EP3.msgpack \
    && log "exported+committed checkpoints/vaetf_620k_ep$EP3.msgpack"
fi

# ---- 6. bench prefill (round-end warm cache) ----
timeout 3000 python bench.py > $W/bench_prefill.json 2> $W/bench_prefill.err
log "bench rc=$? :: $(cat $W/bench_prefill.json)"
commit_eval "bench_prefill" "$W/bench_prefill.json"
log "COMPLETE"
