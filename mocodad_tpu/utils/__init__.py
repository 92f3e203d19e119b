from mocodad_tpu.utils.tensors import load_tensors, save_tensors  # noqa: F401
from mocodad_tpu.utils.torch_compat import (  # noqa: F401
    convert_torch_state_dict, export_torch_state_dict,
    load_torch_checkpoint)
