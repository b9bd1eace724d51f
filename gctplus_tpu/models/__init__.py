from gctplus_tpu.models.masks import get_src_mask, get_trg_mask, nopeak_mask
from gctplus_tpu.models.cvaetf import Cvaetf, Vaetf, ModelConfig
from gctplus_tpu.models.registry import MODEL_REGISTRY, build_model, init_params
