from gctplus_tpu.sample.decode import DecodeEngine, top_k_filter_probs
from gctplus_tpu.sample.samplers import (
    SAMPLER_REGISTRY,
    BaseSampler,
    CvaetfSampler,
    PscaVaetfSampler,
    ScaVaetfSampler,
    VaetfSampler,
    get_sampler,
)
