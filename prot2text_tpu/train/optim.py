"""Optimizers, schedules and the jitted train-state update.

Replaces the reference's torch AdamW + LambdaLR/StepLR stacks:
  * cosine-with-warmup (6% warmup) — train_contrast.py:621-637 (the schedule
    closure at :624-631), stepped per-epoch (contrast) or per-step (instruct,
    train_instruct.py:293-294); here schedules are pure functions of the step
    counter inside one jitted update (no .step() calls).
  * StepLR(gamma) per epoch — train_legacy.py:325.
  * AdamW(lr 2e-4, eps 1e-6, wd 0.01) — train_contrast.py:621,
    train_instruct.py:431.
  * gradient clipping — train_*.py clip_grad_norm_ equivalents.
  * gradient accumulation — microbatch lax.scan inside the step (reference
    loops Python-side, train_contrast.py:429-465).

DeepSpeed's fused AdamW (reference README install flag) is unnecessary —
optax.adamw is XLA-fused already (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_warmup_schedule(base_lr: float, total_steps: int,
                           warmup_frac: float = 0.06,
                           steps_per_period: int = 1):
    """lr(t) = linear warmup to base_lr over warmup_frac·total, then cosine
    decay to 0 — matching the reference closure at train_contrast.py:624-631.

    `steps_per_period` > 1 evaluates the schedule at `step //
    steps_per_period`, reproducing the reference's PER-EPOCH stepping in the
    contrastive trainer (scheduler.step() once per epoch, :662) while the
    instruct trainer steps per optimizer step (train_instruct.py:293-294,
    steps_per_period=1)."""
    warmup = max(int(total_steps * warmup_frac), 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        if steps_per_period > 1:
            step = jnp.floor(step / steps_per_period)
        warm = base_lr * step / warmup
        progress = (step - warmup) / jnp.maximum(total_steps - warmup, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup, warm, cos)

    return sched


def step_lr_schedule(base_lr: float, gamma: float, steps_per_epoch: int):
    """StepLR(step_size=1 epoch, gamma) — train_legacy.py:325."""

    def sched(step):
        epoch = jnp.asarray(step, jnp.int32) // max(steps_per_epoch, 1)
        return base_lr * (gamma ** epoch.astype(jnp.float32))

    return sched


def adamw_cosine_warmup(base_lr: float, total_steps: int,
                        warmup_frac: float = 0.06,
                        weight_decay: float = 0.0,
                        eps: float = 1e-6,
                        grad_clip: Optional[float] = None,
                        steps_per_period: int = 1):
    sched = cosine_warmup_schedule(base_lr, total_steps, warmup_frac,
                                   steps_per_period)
    tx = optax.adamw(learning_rate=sched, eps=eps, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def adamw_constant(lr: float, weight_decay: float = 0.0, eps: float = 1e-6,
                   grad_clip: Optional[float] = None):
    tx = optax.adamw(learning_rate=lr, eps=eps, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def step_lr(base_lr: float, gamma: float, steps_per_epoch: int,
            grad_clip: Optional[float] = None):
    sched = step_lr_schedule(base_lr, gamma, steps_per_epoch)
    tx = optax.adamw(learning_rate=sched)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


@dataclasses.dataclass
class TrainState:
    """Minimal pytree train state (flax-free): trainable params, opt state,
    step counter."""

    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[])


def apply_updates(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(params=new_params, opt_state=new_opt,
                      step=state.step + 1)
