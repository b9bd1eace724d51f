#!/bin/bash
# Commit in-flight psca/sca/psamp protocol cells every ~4 min so a VM
# wipe or round cutoff mid-run loses at most one window (the task
# loops are cell-resumable: tasks/psca_sampling.py row_*.json +
# gen_*.csv are both checkpoint and result). Aggregate partial rows
# with scripts/psca_salvage.py.
set -u
cd /root/repo
W=_work/bigrun
echo $$ > /tmp/psca_insurance.pid
while true; do
  for d in "$W"/results_* _work/bigrun15/results_*; do
    [ -d "$d" ] || continue
    tag=$(basename "$d")
    case "$d" in _work/bigrun15/*) tag="b15_$tag" ;; esac
    for sub in "$d"/*; do
      [ -d "$sub" ] || continue
      dst="evidence/bigrun_r4/partial/$tag/$(basename "$sub")"
      mkdir -p "$dst"
      cp -u "$sub"/row_*.json "$sub"/gen_*.csv "$sub"/metric*.csv \
        "$sub"/record.log "$dst"/ 2>/dev/null
    done
  done
  if ! git diff --quiet --cached -- evidence 2>/dev/null \
      || [ -n "$(git status --porcelain evidence 2>/dev/null)" ]; then
    git add evidence/bigrun_r4/partial 2>/dev/null
    git commit -q -m "Protocol insurance: partial psca/sca cells" \
      -- evidence/bigrun_r4/partial 2>/dev/null \
      && echo "[psca-insurance $(date +%H:%M:%S)] committed"
  fi
  sleep 240
done
