#!/usr/bin/env bash
# Unconditioned sampling + MOSES-style metrics
# (reference Bashscript/infer/uc_sampling.sh).
MODEL_NAME=${MODEL_NAME:-vaetf1}
EPOCH=${EPOCH:-40}
python -m gctplus_tpu.cli uc-sampling \
    -model_type vaetf \
    -model_folder ./Experiment/${MODEL_NAME} \
    -model_name model_${EPOCH}.msgpack \
    -util_folder ./Data/utils \
    -data_folder ./Data \
    -save_folder ./Results/${MODEL_NAME} \
    -n_samples 30000 \
    "$@"
