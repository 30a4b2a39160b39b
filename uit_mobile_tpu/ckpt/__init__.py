from .torch_convert import (
    uit_params_from_torch_state_dict,
    mobilenetv2_params_from_torch_state_dict,
    load_torch_checkpoint,
)
from .io import save_checkpoint, load_checkpoint, average_checkpoints
from .artifact import export_serving, save_artifact, load_artifact

__all__ = [
    "export_serving",
    "save_artifact",
    "load_artifact",
    "uit_params_from_torch_state_dict",
    "mobilenetv2_params_from_torch_state_dict",
    "load_torch_checkpoint",
    "save_checkpoint",
    "load_checkpoint",
    "average_checkpoints",
]
