"""Frozen deployment artifacts: the full inspection step as serialized StableHLO.

The reference ships trained `.pt` files and needs the whole Ultralytics/torch
stack at the edge to run them (reference: config.py:67, measurement.py:145).
The tti analog is stronger: `tti export` freezes the ENTIRE jitted inspection
step — fused preprocess, YOLOv8-seg forward, decode/NMS, mask statistics and
the px->mm measurement core — into one portable jax.export (StableHLO)
artifact plus a weights bundle, in a single .npz file.

Properties:
- self-contained: loading needs jax + this module, NOT the model zoo, the
  preprocess stack, or the measurement code — the graph is frozen;
- version-pinned: the artifact records the exact compiled semantics at export
  time (a later code change cannot silently alter a deployed line's numbers);
- multi-platform: lowered for TPU and CPU by default, so the same artifact
  serves the line and a CPU canary/debug host;
- weights stay ARGUMENTS, not baked constants: tethered deployments reject
  serialized programs with embedded multi-MB constants (remote-compile request
  limits; see tti/parallel/runtime.py warp_weights note), and a weights-swap
  (recalibrated warp, retrained checkpoint with identical shapes) reuses the
  same frozen graph.

Artifact layout (np.savez):
    __stablehlo__   uint8 blob (jax.export serialization)
    __manifest__    JSON: format version, batch/frame geometry, output names
    v<i> / w<i>     model-variable / warp-weight leaves in treedef order
"""

from __future__ import annotations

import io
import json

import jax
import numpy as np

FORMAT_VERSION = 1


def _flatten_outputs(outs: dict):
    """Deterministic (names, leaves) for an output pytree: flax.struct rows
    flatten to their field leaves; names are '/'-joined key paths."""
    flat = jax.tree_util.tree_flatten_with_path(outs)[0]
    names = ["/".join(str(getattr(k, "name", getattr(k, "key", getattr(k, "idx", k))))
                      for k in path)
             for path, _ in flat]
    return names, [leaf for _, leaf in flat]


def export_pipeline(pipeline, batch: int, platforms=("tpu", "cpu")) -> bytes:
    """Freeze a built InspectionPipeline's device step for a fixed batch size.

    Returns the artifact file contents (npz bytes). The frozen signature is
    (variable_leaves, warp_leaves, frames_u8 (batch, H, W, 3)) -> output
    leaves; leaf order and output names live in the manifest.
    """
    h, w = pipeline.frame_hw
    v_leaves, v_tdef = jax.tree_util.tree_flatten(pipeline.variables)
    w_leaves, w_tdef = jax.tree_util.tree_flatten(pipeline.warp_weights)

    out_names: list[str] = []

    def step(v_flat, w_flat, frames_u8):
        variables = jax.tree_util.tree_unflatten(v_tdef, v_flat)
        warp = jax.tree_util.tree_unflatten(w_tdef, w_flat)
        outs = pipeline.postprocess_chain(variables, pipeline.preprocess(frames_u8, warp))
        names, leaves = _flatten_outputs(outs)
        out_names[:] = names
        return tuple(leaves)

    spec = lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
    exported = jax.export.export(jax.jit(step), platforms=list(platforms))(
        [spec(x) for x in v_leaves],
        [spec(x) for x in w_leaves],
        jax.ShapeDtypeStruct((batch, h, w, 3), np.uint8),
    )

    manifest = {
        "format_version": FORMAT_VERSION,
        "batch": batch,
        "frame_hw": [h, w],
        "platforms": list(platforms),
        "outputs": out_names,
        "n_variable_leaves": len(v_leaves),
        "n_warp_leaves": len(w_leaves),
    }
    payload = {
        "__stablehlo__": np.frombuffer(bytes(exported.serialize()), np.uint8),
        "__manifest__": np.frombuffer(json.dumps(manifest).encode(), np.uint8),
    }
    for i, leaf in enumerate(v_leaves):
        payload[f"v{i}"] = np.asarray(leaf)
    for i, leaf in enumerate(w_leaves):
        payload[f"w{i}"] = np.asarray(leaf)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    return buf.getvalue()


class FrozenPipeline:
    """A deserialized export artifact: callable frames -> {name: np.ndarray}.

    Needs only jax and the artifact — no model, preprocess, or measurement
    code. Weights ride inside the artifact and are passed as call arguments
    (swap them by writing new v<i>/w<i> entries with identical shapes).
    """

    def __init__(self, data: bytes | str):
        if isinstance(data, (bytes, bytearray)):
            npz = np.load(io.BytesIO(bytes(data)))
        else:
            npz = np.load(data)
        self.manifest = json.loads(bytes(npz["__manifest__"].tobytes()).decode())
        if self.manifest["format_version"] != FORMAT_VERSION:
            raise ValueError(f"unsupported artifact version {self.manifest['format_version']}")
        self._exported = jax.export.deserialize(npz["__stablehlo__"].tobytes())
        self._v = [npz[f"v{i}"] for i in range(self.manifest["n_variable_leaves"])]
        self._w = [npz[f"w{i}"] for i in range(self.manifest["n_warp_leaves"])]

    def __call__(self, frames_u8: np.ndarray) -> dict[str, np.ndarray]:
        b, h, w = self.manifest["batch"], *self.manifest["frame_hw"]
        if frames_u8.shape != (b, h, w, 3) or frames_u8.dtype != np.uint8:
            raise ValueError(
                f"artifact frozen for uint8 {(b, h, w, 3)}, got "
                f"{frames_u8.dtype} {frames_u8.shape}")
        leaves = self._exported.call(self._v, self._w, frames_u8)
        return {name: np.asarray(leaf)
                for name, leaf in zip(self.manifest["outputs"], leaves)}
