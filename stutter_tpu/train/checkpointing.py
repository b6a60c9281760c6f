"""Fine-tune checkpoint/resume via orbax (SURVEY.md §5).

The reference only checkpoints extraction progress (pickles); training state
was never resumable. Here the full fine-tune state (params, opt_state, step)
round-trips through orbax — shard-aware, so a run restores onto the same
mesh layout it was saved from.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from stutter_tpu.utils.logging import get_logger

logger = get_logger("train.checkpointing")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(ckpt_dir: str, step: int, params, opt_state) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = _checkpointer()
    ckptr.save(path, {"params": params, "opt_state": opt_state,
                      "step": np.asarray(step, np.int64)})
    ckptr.wait_until_finished()
    logger.info("saved train state at step %d -> %s", step, path)
    return path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_"):
            try:
                steps.append(int(d.split("_")[1]))
            except (IndexError, ValueError):
                continue
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str, step: int, like_params, like_opt_state):
    """Restore onto the structure (and shardings) of the provided templates."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = _checkpointer()
    template = {"params": like_params, "opt_state": like_opt_state,
                "step": np.asarray(0, np.int64)}
    restored = ckptr.restore(path, template)
    logger.info("restored train state from %s", path)
    return restored["params"], restored["opt_state"], int(restored["step"])
