#!/usr/bin/env bash
# Fine-tune a property-conditioned pvaetf FROM a pretrained vaetf
# checkpoint (the reference's molGCT -> GCT-Plus transfer recipe:
# train1.py loads pretrained weights through build_model and freezes
# modules via freeze_params, Model/build_model.py:17-39).
#
# PRETRAINED may be an in-framework .msgpack or a reference torch .pt
# (the converter handles the state-dict mapping). Shape-mismatched
# leaves (e.g. the condition-widened embedding) keep their fresh init.
PRETRAINED=${PRETRAINED:-./Experiment/vaetf1/model_best.msgpack}
MODEL_NAME=${MODEL_NAME:-pvaetf_ft1}
python -m gctplus_tpu.tasks.train_task \
    -seed 1 \
    -model_type pvaetf \
    -use_model_path "${PRETRAINED}" \
    -freeze_params encoder \
    -lr_WarmUpSteps 4000 \
    -use_cond2lat \
    -start_epoch 1 \
    -num_epoch 20 \
    -batch_size 128 \
    -property_list logP tPSA QED \
    -model_folder ./Experiment/${MODEL_NAME} \
    -prepared_folder ./Data/prepared \
    -util_folder ./Data/utils \
    "$@"
