#!/bin/bash
# Round-4 continuation (after the nofb probe decided the arm):
#   C'. psca at the reference's n=1000/cell x 15 scaffolds x 27
#       combos, seen + unseen, on the FREE-BITS-OFF arm ep73 (probe
#       validity 0.6084 > ep66's 0.5755 — the 0.62 threshold in
#       chain_round4.sh was mis-set; nofb dominates on validity, SSF
#       and valid_molgpt).
#   E.  sca at the reference's n=10k/scaffold (sample-count honesty,
#       VERDICT r3 item 4) x 15 scaffolds, seen + unseen, scavaetf
#       ep48.
#   F.  psamp 27 x 2500 at the FIXED 0.03 QED tolerance on pvaetf
#       ep45 (ratio metrics are n-robust; uniqueness is quoted from
#       the r3 27x10k run, which tolerance does not affect).
set -u
cd /root/repo
W=_work/bigrun
HARD_STOP=${HARD_STOP:-$(( $(date +%s) + 6600 ))}
echo $$ > /tmp/chain_r4b.pid
log() { echo "[chain-r4b $(date +%H:%M:%S)] $*" | tee -a $W/chain_r4.log; }
guard() { [ "$(date +%s)" -lt "$HARD_STOP" ]; }

commit_eval() {
  local tag=$1; shift
  local dst=evidence/bigrun_r4/$tag
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

# ---- C'. psca1k on the nofb arm ----
export GCT_RUN_SUFFIX=_nofb
for SRC in train test_scaffolds; do
  guard || break
  timeout 3600 python scripts/eval_bigrun.py psca /root/repo/$W 73 \
    1000 15 $SRC > $W/eval_psca1k_${SRC}_73.out 2>&1
  log "psca1k nofb $SRC rc=$? :: $(grep -a PSCA_MEAN \
    $W/eval_psca1k_${SRC}_73.out | tail -1 | cut -c1-220)"
  commit_eval "psca1k_${SRC}_ep73_nofb" \
    "$W/results_pscavaetf_nofb_73_${SRC}" "$W/eval_psca1k_${SRC}_73.out"
done
unset GCT_RUN_SUFFIX

# ---- E. sca at 10k/scaffold ----
for SRC in train test_scaffolds; do
  guard || break
  timeout 2400 python scripts/eval_bigrun.py sca /root/repo/$W 48 \
    10000 15 $SRC > $W/eval_sca10k_${SRC}_48.out 2>&1
  log "sca10k $SRC rc=$? :: $(grep -a SCA_MEAN \
    $W/eval_sca10k_${SRC}_48.out | tail -1 | cut -c1-220)"
  commit_eval "sca10k_${SRC}_ep48" \
    "$W/results_scavaetf_48_${SRC}" "$W/eval_sca10k_${SRC}_48.out"
done

# ---- F. psamp at tol 0.03 ----
if guard; then
  timeout 2400 python scripts/eval_bigrun.py psamp /root/repo/$W 45 2500 \
    > $W/eval_psamp_tol003_45.out 2>&1
  log "psamp tol003 rc=$? :: $(grep -a PSAMP_MEAN \
    $W/eval_psamp_tol003_45.out | tail -1 | cut -c1-220)"
  commit_eval "psamp_ep45_2500_tol003" "$W/results_pvaetf_45" \
    "$W/eval_psamp_tol003_45.out"
fi
log "R4B COMPLETE"
