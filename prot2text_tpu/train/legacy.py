"""Legacy full-finetune SFT step (Esm2LlamaForCausalLM + concat fusion).

Reimplements reference scripts/train_legacy.py's train loop core: full-model
teacher forcing through the concat-fusion model (derived-collator layout,
dataset/dataloader_derived.py:33-58), AdamW + StepLR, optional FSDP → here
parameter sharding over the mesh 'fsdp' axis via NamedShardings, and bf16
params instead of the fp16 autocast+GradScaler path (train_legacy.py:157-194)
— bf16 needs no loss scaling on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.composed import Esm2LlamaConfig, Esm2LlamaForCausalLM
from .optim import TrainState, apply_updates


def make_legacy_train_step(*, config: Esm2LlamaConfig, tx,
                           attn_impl: str = "xla", remat: bool = True,
                           grad_accum: int = 1):
    """Returns jittable `step(state, batch) -> (state, loss)` training ALL
    params (encoder + adapter + decoder)."""

    def loss_fn(params, batch):
        out = Esm2LlamaForCausalLM.apply(
            config, params,
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            labels=batch["labels"],
            protein_input_ids=batch["protein_input_ids"],
            protein_attention_mask=batch["protein_attention_mask"],
            attn_impl=attn_impl, remat=remat)
        return out.loss

    def step(state: TrainState, batch):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        else:
            def body(carry, mb):
                acc_loss, acc_grads = carry
                loss, grads = jax.value_and_grad(loss_fn)(state.params, mb)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc_loss + loss, acc_grads), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zeros), batch)
            loss = loss / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
        new_state = apply_updates(state, grads, tx)
        return new_state, loss

    return step
