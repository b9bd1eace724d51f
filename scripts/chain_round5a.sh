#!/bin/bash
# Round-5 eval chain A (VERDICT r4 items 1a + 2):
#   1. finish the psca1k seen (train) arm — 216 remaining cells of
#      405; cell-resumable (rows re-seeded from evidence partials).
#   2. psamp at the reference 27x10k protocol with the corrected QED
#      tolerance 0.03 (config.py::PROP_TOLERANCES since round 4) —
#      replaces the tol-0.04 headline in README/EVIDENCE.
set -u
cd /root/repo
W=_work/bigrun
echo $$ > /tmp/chain_r5a.pid
log() { echo "[chain-r5a $(date +%H:%M:%S)] $*" | tee -a $W/chain_r5.log; }

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

# ---- 1. finish psca1k seen arm (nofb ep73) ----
export GCT_RUN_SUFFIX=_nofb
timeout 7200 python scripts/eval_bigrun.py psca /root/repo/$W 73 \
  1000 15 train > $W/eval_psca1k_train_73.out 2>&1
log "psca1k nofb train rc=$? :: $(grep -a PSCA_MEAN \
  $W/eval_psca1k_train_73.out | tail -1 | cut -c1-260)"
commit_eval "psca1k_train_ep73_nofb" \
  "$W/results_pscavaetf_nofb_73_train" "$W/eval_psca1k_train_73.out"
unset GCT_RUN_SUFFIX

# ---- 2. psamp 27x10k at tol 0.03 ----
timeout 5400 python scripts/eval_bigrun.py psamp /root/repo/$W 45 10000 \
  > $W/eval_psamp10k_tol003_45.out 2>&1
log "psamp10k tol003 rc=$? :: $(grep -a PSAMP_MEAN \
  $W/eval_psamp10k_tol003_45.out | tail -1 | cut -c1-260)"
commit_eval "psamp_ep45_10k_tol003" "$W/results_pvaetf_45" \
  "$W/eval_psamp10k_tol003_45.out"

log "R5A COMPLETE"
