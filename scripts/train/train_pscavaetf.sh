#!/usr/bin/env bash
# Train the property+scaffold pscavaetf (reference
# Bashscript/train/train_pscavaetf.sh recipe: warmup 15000, cond2lat,
# scaffold, batch 64x2GPU -> batch 128 over the data mesh here).
MODEL_NAME=${MODEL_NAME:-pscavaetf1}
python -m gctplus_tpu.tasks.train_task \
    -seed 1 \
    -model_type pscavaetf \
    -lr_WarmUpSteps 15000 \
    -use_cond2lat \
    -use_scaffold \
    -start_epoch 1 \
    -num_epoch 50 \
    -batch_size 128 \
    -property_list logP tPSA QED \
    -model_folder ./Experiment/${MODEL_NAME} \
    -prepared_folder ./Data/prepared \
    -util_folder ./Data/utils \
    "$@"
