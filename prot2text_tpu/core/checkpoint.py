"""Sharding-aware checkpoint/resume (orbax-backed).

One abstraction replacing the reference's three per-model flavors
(SURVEY.md §5 "Checkpoint / resume"):
  1. contrast: adapter-only state_dict + optimizer/scheduler
     (train_contrast.py:674-701) → save(trainable-only TrainState)
  2. instruct: PEFT adapter dir + optimizer/scheduler
     (train_instruct.py:484-508) → save(LoRA+adapter TrainState)
  3. legacy: full model+optimizer+scheduler, FSDP-gathered
     (train_legacy.py:362-381) → orbax handles sharded arrays natively; no
     FULL_STATE_DICT gather dance is needed — every process writes its shards.

Unlike the reference, resume restores the STEP COUNTER too (the reference
loses epoch/sampler position on resume — SURVEY.md §5 failure-detection note).
Checkpoint dirs are step-labelled under a timestamped root, matching the
reference's `checkpoints_%y%m%d_%H%M%S` convention (train_contrast.py:749).
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Optional

import jax
import numpy as np


def timestamped_dir(base: str, prefix: str = "checkpoints") -> str:
    stamp = datetime.datetime.now().strftime("%y%m%d_%H%M%S")
    path = os.path.join(base, f"{prefix}_{stamp}")
    os.makedirs(path, exist_ok=True)
    return path


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, step: int, tree: Any) -> str:
    """Write `tree` (any pytree of arrays) to {directory}/step_{step}."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       target: Any = None) -> Any:
    """Restore a tree; with `target` (matching abstract/concrete pytree) the
    restored leaves adopt target dtypes/shardings."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = _checkpointer()
    if target is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), x.dtype,
                sharding=getattr(x, "sharding", None)),
            target)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
