#!/usr/bin/env bash
# Scaffold-conditioned scavaetf (reference Bashscript/train/train_scavaetf.sh:
# warmup 15000, scaffold prefix data plumbing).
MODEL_NAME=${MODEL_NAME:-scavaetf1}
python -m gctplus_tpu.tasks.train_task \
    -seed 1 -model_type scavaetf -lr_WarmUpSteps 15000 -use_scaffold \
    -start_epoch 1 -num_epoch 30 -batch_size 128 \
    -model_folder ./Experiment/${MODEL_NAME} \
    -prepared_folder ./Data/prepared -util_folder ./Data/utils "$@"
