#!/usr/bin/env bash
# Property+scaffold joint sampling (reference
# Bashscript/infer/psca_sampling.sh): 100 scaffolds x 27 combos x 1k.
MODEL_NAME=${MODEL_NAME:-pscavaetf1}
EPOCH=${EPOCH:-50}
python -m gctplus_tpu.cli psca-sampling \
    -model_type pscavaetf \
    -use_cond2lat \
    -property_list logP tPSA QED \
    -model_folder ./Experiment/${MODEL_NAME} \
    -model_name model_${EPOCH}.msgpack \
    -util_folder ./Data/utils \
    -data_folder ./Data \
    -save_folder ./Results/${MODEL_NAME} \
    -n_samples 1000 -n_scaffolds 100 \
    "$@"
