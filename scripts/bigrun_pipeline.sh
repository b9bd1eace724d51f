#!/bin/bash
# MOSES-scale pipeline: preprocess -> (parallel) train-step compile
# warmup -> vaetf train -> uc@30k -> pvaetf train -> 27-combo psamp.
# Each stage is resumable; logs under _work/.
set -x
cd /root/repo
W=/root/repo/_work/bigrun

python scripts/prep_from_csv.py /root/repo/_work/raw620k.csv $W \
  > _work/prep2.out 2>&1 || exit 1

python scripts/train_bigrun.py vaetf $W 15 > _work/train_vaetf.out 2>&1 \
  || exit 1
python scripts/eval_bigrun.py uc $W 15 30000 > _work/eval_uc.out 2>&1

python scripts/train_bigrun.py pvaetf $W 15 > _work/train_pvaetf.out 2>&1 \
  || exit 1
python scripts/eval_bigrun.py psamp $W 15 10000 > _work/eval_psamp.out 2>&1
echo PIPELINE_DONE
