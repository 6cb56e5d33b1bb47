from tti.preprocess.letterbox import (
    LetterboxSpec,
    bgr_to_rgb,
    letterbox,
    letterbox_spec,
    letterbox_spec_rect,
    make_letterbox_spec,
    normalize,
    preprocess_frames,
    scale_boxes_to_frame,
)
from tti.preprocess.remap import build_undistort_letterbox_map, remap_bilinear

__all__ = [
    "LetterboxSpec",
    "bgr_to_rgb",
    "letterbox",
    "letterbox_spec",
    "letterbox_spec_rect",
    "make_letterbox_spec",
    "normalize",
    "preprocess_frames",
    "scale_boxes_to_frame",
    "build_undistort_letterbox_map",
    "remap_bilinear",
]
