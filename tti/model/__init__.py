from tti.model.yolo import YOLOv8Seg, RawPredictions, create_model, model_channels
from tti.model.convert import convert_torch_state_dict, load_checkpoint, save_checkpoint

__all__ = [
    "YOLOv8Seg",
    "RawPredictions",
    "create_model",
    "model_channels",
    "convert_torch_state_dict",
    "load_checkpoint",
    "save_checkpoint",
]
