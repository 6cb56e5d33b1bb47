"""Reference-compatible predict surface: frames -> boxes / scores / classes /
frame-resolution instance masks.

This is the drop-in equivalent of what the reference consumes from Ultralytics
(reference: measurement.py:208-210 ``model.predict(rgb, conf, iou, max_det,
imgsz=960)`` and measurement.py:242-246 / 70-86 ``r.boxes.{cls,xyxy,conf}`` +
``r.masks.data`` NEAREST-resized to the frame). The device step jits the whole
chain — auto minimal-rect letterbox, YOLOv8-seg forward, DFL decode, batched
NMS, Ultralytics process_mask(upsample=True) mask assembly — and returns
input-resolution binary masks; the final cv2-convention NEAREST resize to frame
size happens on host (it is a pure integer-index gather, and keeping it off
the device avoids materializing (N, frame_h, frame_w) tensors in HBM).

The production measurement path (tti.parallel.runtime.InspectionPipeline) never
materializes masks at all; this surface exists for reference users, rendering,
dataset tooling and the cross-framework parity harness
(tests/test_predict_parity.py, tools/parity_report.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tti.core.config import ModelConfig
from tti.model.yolo import YOLOv8Seg, create_model
from tti.postprocess.decode import decode_predictions
from tti.postprocess.masks import masks_at_input
from tti.postprocess.nms import batched_nms
from tti.preprocess.letterbox import (
    LetterboxSpec,
    make_letterbox_spec,
    scale_boxes_to_frame,
)


def _packbits_lastdim(bits: jax.Array) -> jax.Array:
    """(..., W) {0,1} uint8 -> (..., ceil(W/8)) uint8, np.packbits bit order
    (MSB first). Shrinks the device->host mask transfer 8x."""
    w = bits.shape[-1]
    pad = (-w) % 8
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    grouped = bits.reshape(bits.shape[:-1] + ((w + pad) // 8, 8))
    return jnp.sum(grouped * weights, axis=-1, dtype=jnp.uint8)


def _unpackbits_lastdim(packed: np.ndarray, w: int) -> np.ndarray:
    """Inverse of _packbits_lastdim on host."""
    return np.unpackbits(packed, axis=-1)[..., :w]


@dataclass
class PredictResult:
    """Host-side predict outputs for one batch (numpy).

    Rows are score-sorted (the Ultralytics output order); ``valid`` masks the
    fixed-shape padding. ``masks_input`` is (B, M, H, W) binary at model-input
    resolution — the analog of ``results[0].masks.data`` — where
    M = min(max_det, mask_topk)."""

    boxes: np.ndarray  # (B, D, 4) xyxy in frame px, clipped
    scores: np.ndarray  # (B, D)
    classes: np.ndarray  # (B, D) int32, -1 on padding
    valid: np.ndarray  # (B, D) bool
    masks_input: np.ndarray  # (B, M, Hi, Wi) uint8 binary
    spec: LetterboxSpec
    masks_proto: np.ndarray | None = None  # (B, M, Hi/4, Wi/4) uint8, proto-res chain


class Predictor:
    """Jitted full predict chain for one model (reference predict parity)."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        variables: dict,
        frame_hw: tuple[int, int],
        mask_topk: int = 64,
        model: YOLOv8Seg | None = None,
        proto_masks: bool = False,
    ) -> None:
        self.model_cfg = model_cfg
        self.frame_hw = frame_hw
        self.spec = make_letterbox_spec(
            frame_hw[0], frame_hw[1], model_cfg.image_size, model_cfg.letterbox
        )
        dtype = jnp.bfloat16 if model_cfg.dtype == "bfloat16" else jnp.float32
        self.model = model or create_model(
            model_cfg.variant, nc=model_cfg.num_classes, dtype=dtype,
            mask_stride=model_cfg.mask_stride, proto_head=model_cfg.proto_head,
        )
        self.variables = jax.device_put(variables)
        self.mask_topk = min(mask_topk, model_cfg.max_detections)
        self.proto_masks = proto_masks
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        spec = self.spec
        mcfg = self.model_cfg
        topk = self.mask_topk
        pre_dtype = jnp.bfloat16 if mcfg.dtype == "bfloat16" else jnp.float32

        def step(variables, frames_u8):
            # letterbox_u8 with the precomputed spec: re-deriving geometry
            # from (dst_h, dst_w) can disagree with a rect spec by 1px on
            # the non-binding axis (scale_boxes_to_frame inverts spec.scale).
            from tti.preprocess.letterbox import letterbox_u8

            x = letterbox_u8(frames_u8, spec, pre_dtype)
            raw = self.model.apply(variables, x, train=False)
            boxes, probs, coefs = decode_predictions(raw)
            dets = batched_nms(
                boxes, probs, coefs,
                conf_thresh=mcfg.conf_thresh, iou_thresh=mcfg.iou_thresh,
                max_det=mcfg.max_detections, pre_topk=mcfg.nms_pre_topk,
            )
            # Bit-packed on device: masks are binary, and the host fetch of
            # (M, H, W) float32 masks dominates end-to-end latency on
            # relay-attached devices (565 MB at M=200, 960x736; packed: 17.7 MB
            # — measured 31 s -> ~4 s on the axon relay). Host unpacks with
            # np.unpackbits.
            masks = jax.vmap(
                lambda d, p: masks_at_input(
                    p,
                    d.coefs[:topk],
                    d.boxes[:topk],
                    d.valid[:topk],
                    (spec.dst_h, spec.dst_w),
                )
            )(dets, raw.protos)
            masks = _packbits_lastdim(masks.astype(jnp.uint8))
            out = {
                "boxes_frame": scale_boxes_to_frame(dets.boxes, spec),
                "scores": dets.scores,
                "classes": dets.classes,
                "valid": dets.valid,
                "masks_input": masks,
            }
            if self.proto_masks:
                from tti.postprocess.masks import assemble_masks

                out["masks_proto"] = jax.vmap(
                    lambda d, p: assemble_masks(
                        p, d.coefs[:topk], d.boxes[:topk], d.valid[:topk],
                        (spec.dst_h, spec.dst_w),
                    )
                )(dets, raw.protos).astype(jnp.uint8)
            return out

        return step

    def __call__(self, frames_bgr_u8: np.ndarray) -> PredictResult:
        outs = self._step(self.variables, jnp.asarray(frames_bgr_u8))
        return PredictResult(
            boxes=np.asarray(outs["boxes_frame"], np.float32),
            scores=np.asarray(outs["scores"], np.float32),
            classes=np.asarray(outs["classes"]),
            valid=np.asarray(outs["valid"]),
            masks_input=_unpackbits_lastdim(np.asarray(outs["masks_input"]),
                                            self.spec.dst_w),
            spec=self.spec,
            masks_proto=(np.asarray(outs["masks_proto"])
                         if "masks_proto" in outs else None),
        )

    def masks_to_frame(self, masks_input: np.ndarray) -> np.ndarray:
        """Input-resolution masks -> frame-resolution uint8 masks with the
        reference's cv2.INTER_NEAREST convention (source index =
        floor(dst * src/dst); reference measurement.py:79). Host-side numpy
        gather — identical math to tti.postprocess.masks.resize_nearest_cv2."""
        h, w = masks_input.shape[-2], masks_input.shape[-1]
        oh, ow = self.frame_hw
        ys = np.clip(np.floor(np.arange(oh) * (h / oh)).astype(np.int64), 0, h - 1)
        xs = np.clip(np.floor(np.arange(ow) * (w / ow)).astype(np.int64), 0, w - 1)
        out = masks_input[..., ys[:, None], xs[None, :]]
        return (out > 0).astype(np.uint8)
