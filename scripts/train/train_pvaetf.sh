#!/usr/bin/env bash
# Property-conditioned pvaetf (reference Bashscript/train/train_pvaetf.sh).
MODEL_NAME=${MODEL_NAME:-pvaetf1}
python -m gctplus_tpu.tasks.train_task \
    -seed 1 -model_type pvaetf -use_cond2lat \
    -start_epoch 1 -num_epoch 30 -batch_size 128 \
    -property_list logP tPSA QED \
    -model_folder ./Experiment/${MODEL_NAME} \
    -prepared_folder ./Data/prepared -util_folder ./Data/utils "$@"
