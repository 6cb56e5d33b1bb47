from tti.postprocess.decode import Detections, decode_predictions, flatten_predictions, make_anchors
from tti.postprocess.nms import batched_nms
from tti.postprocess.masks import assemble_masks, crop_masks, mask_iou

__all__ = [
    "Detections",
    "decode_predictions",
    "flatten_predictions",
    "make_anchors",
    "batched_nms",
    "assemble_masks",
    "crop_masks",
    "mask_iou",
]
