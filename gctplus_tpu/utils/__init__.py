from gctplus_tpu.utils.logging import get_logger
from gctplus_tpu.utils.seed import set_seed
