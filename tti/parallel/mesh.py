"""Device mesh + sharding helpers.

The reference has no parallelism at all (SURVEY.md §2 "Parallelism" — four host
threads, one synchronous predict call). The TPU build's scaling axis is the
*frame batch*: shard it over a 1-D 'data' mesh with pjit-style NamedShardings
and let XLA insert any ICI collectives (gradient psums in training; inference
is embarrassingly parallel).

No model parallelism is warranted: YOLOv8n/m is a ~3-27M parameter CNN that
fits trivially per chip (SURVEY.md §2 parallelism note), so 'model' axes would
only add collective latency. The mesh helper still accepts multi-axis shapes
for forward-compatibility (e.g. a future spatial-partitioning axis).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: tuple[int, ...] | None = None,
    axis_names: tuple[str, ...] = ("data",),
    devices: list | None = None,
) -> Mesh:
    """Build a Mesh over local devices. shape=None => all devices on axis 0."""
    devices = devices if devices is not None else jax.devices()
    if shape is None or len(shape) == 0:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (the frame batch) over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for an NHWC frame batch over whichever parallel axes the mesh
    has: batch on 'data', frame HEIGHT on 'space' (spatial partitioning).

    Spatial partitioning is the latency analog of data parallelism: a
    convolutional forward sharded on H runs each chip over an H/n slab, and
    XLA's SPMD partitioner inserts the halo exchanges (ppermute of the k//2
    boundary rows per conv) over ICI. Data parallelism cannot reduce the
    latency of ONE frame; a 'space' axis can — the single-frame p50 is
    dispatch+compute of a 1/n-height slab. Global stages (top_k over anchors,
    NMS, measurement) make XLA gather per-frame tensors; they are a few
    percent of the step, so the conv-dominated forward sets the scaling.
    """
    names = mesh.axis_names
    return NamedSharding(
        mesh, P("data" if "data" in names else None,
                "space" if "space" in names else None)
    )


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a host pytree with dim-0 sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
