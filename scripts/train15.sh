#!/bin/bash
# Continue a flagship checkpoint on the 1.5M extended corpus
# (_work/bigrun15 from scripts/prep_extend_corpus.py): seeds the new
# workdir's run dir with the newest 620k checkpoint (same vocab/scaler
# by construction), then runs train_bigrun.py there — the resume path
# picks the checkpoint up and continues with the bigger epoch.
#
# Usage: bash scripts/train15.sh VARIANT EPOCHS [SUFFIX] [PIDFILE]
#   e.g. bash scripts/train15.sh pscavaetf 90 _nofb /tmp/train_psca.pid
set -eu
cd /root/repo
V=$1
EPOCHS=$2
SUFFIX=${3:-}
PIDFILE=${4:-/tmp/train_${V}15.pid}
W15=_work/bigrun15
SRC_RUN=_work/bigrun/run_${V}512${SUFFIX}
DST_RUN=$W15/run_${V}512${SUFFIX}

[ -f "$W15/prepared/train.csv" ] || { echo "run prep_extend_corpus first"; exit 1; }
mkdir -p "$DST_RUN"
if ! ls "$DST_RUN"/model_*.msgpack >/dev/null 2>&1; then
  latest=$(ls "$SRC_RUN"/model_*.msgpack | sed 's/.*model_//;s/\.msgpack//' \
    | sort -n | tail -1)
  cp "$SRC_RUN/model_${latest}.msgpack" "$DST_RUN/"
  echo "seeded $DST_RUN with epoch $latest"
fi

export GCT_RUN_SUFFIX=$SUFFIX
# the _nofb arm is the exact-reference-ELBO continuation: free bits
# MUST stay off or the resume silently reverts to the 0.05 floor
# (train_bigrun.py reads GCT_FREE_BITS, not the suffix)
case "$SUFFIX" in *_nofb*) export GCT_FREE_BITS=0 ;; esac
nohup python scripts/train_bigrun.py "$V" /root/repo/$W15 "$EPOCHS" \
  >> $W15/train_${V}${SUFFIX}.out 2>&1 &
echo $! > "$PIDFILE"
echo "launched $V (suffix='$SUFFIX') -> $W15/train_${V}${SUFFIX}.out pid $(cat "$PIDFILE")"
