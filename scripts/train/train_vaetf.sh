#!/usr/bin/env bash
# Train the unconditioned vaetf (reference Bashscript/train/train_vaetf.sh
# recipe: seed 1, batch 128, 40 epochs, warmup 8000). On TPU the device
# mesh replaces CUDA_VISIBLE_DEVICES/torchrun; one process drives all
# local chips.
MODEL_NAME=${MODEL_NAME:-vaetf1}
python -m gctplus_tpu.tasks.train_task \
    -seed 1 \
    -model_type vaetf \
    -start_epoch 1 \
    -num_epoch 40 \
    -batch_size 128 \
    -model_folder ./Experiment/${MODEL_NAME} \
    -prepared_folder ./Data/prepared \
    -util_folder ./Data/utils \
    "$@"
