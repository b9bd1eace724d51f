from gctplus_tpu.convert.torch_loader import (
    convert_state_dict,
    load_torch_checkpoint,
)
