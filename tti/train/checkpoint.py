"""Training-state checkpointing via orbax (with msgpack fallback).

The reference's entire checkpoint story is "load the .pt by path"
(reference: config.py:67, measurement.py:145 — SURVEY.md §5 checkpoint row);
here training runs in-framework, so the full TrainState (params, batch stats,
optimizer state, step) checkpoints atomically and restores across restarts.
"""

from __future__ import annotations

import os
from typing import Any

from tti.core.logging import get_logger

log = get_logger("train.checkpoint")


def save_train_state(state: Any, directory: str, step: int | None = None) -> str:
    """Write a checkpoint; returns its path. Uses orbax when available
    (async-safe atomic writes), else flax msgpack."""
    os.makedirs(directory, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(directory), f"step_{step if step is not None else int(state.step)}")
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path, state, force=True)
        checkpointer.wait_until_finished()
        log.info("saved orbax checkpoint: %s", path)
        return path
    except ImportError:
        from flax import serialization

        path = os.path.join(directory, f"step_{step if step is not None else int(state.step)}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(state))
        log.info("saved msgpack checkpoint: %s", path)
        return path


def restore_train_state(path: str, template: Any) -> Any:
    """Restore a checkpoint into the structure of ``template``."""
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(os.path.abspath(path), template)


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    entries = [e for e in os.listdir(directory) if e.startswith("step_")]
    if not entries:
        return None
    def step_of(name: str) -> int:
        return int(name.split("_")[1].split(".")[0])
    return os.path.join(directory, max(entries, key=step_of))
