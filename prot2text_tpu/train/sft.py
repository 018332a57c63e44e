"""Stage-2 instruction SFT with LoRA — one jitted SPMD step.

Reimplements reference scripts/train_instruct.py: teacher-forcing LM loss on
chat-template batches (labels -100 outside the description, collator layout at
dataset/dataloader.py:23-45), trainable = LoRA trees over the LLM + encoder
targets plus the full modality adapter (train_instruct.py:146-183), frozen =
base ESMC + LLM weights.  The DDP wrapper + PEFT plumbing collapse into a
single jit: grads of the global-mean loss psum automatically over the mesh's
data axes; FSDP-style parameter sharding comes from NamedShardings on the
frozen/base trees (core/partition.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.adapters import ModalityAdapterConfig, modality_adapter
from ..models.decoder import (
    DecoderConfig, causal_bias_from_mask, cross_entropy_loss, decoder_forward,
    decoder_logits,
)
from ..models.esmc import ESMCConfig, esmc_encode
from ..models.fusion import placeholder_merge
from ..models.lora import LoraConfig
from .optim import TrainState, apply_updates


@dataclasses.dataclass(frozen=True)
class SFTConfig:
    lora: LoraConfig = LoraConfig()
    placeholder_id: int = 151669
    fix_modality_adapter: bool = False  # --fix_modality_adapter
    remat: bool = True


def sft_loss(
    trainable: dict,          # {"lora_llm", "lora_esm", "adapter"}
    frozen: dict,             # {"esm_encoder", "llm_decoder", "adapter"?}
    batch: dict,
    *,
    esm_config: ESMCConfig,
    adapter_config: ModalityAdapterConfig,
    decoder_core: DecoderConfig,
    cfg: SFTConfig,
    deterministic: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
):
    # LoRA rides as a low-rank side path inside the stacks — the merged
    # W+ΔW is NEVER materialized during training (merge_lora is reserved for
    # inference merge-and-unload); O(r) extra memory at 14B scale.
    adapter_params = (frozen["adapter"] if cfg.fix_modality_adapter
                      else trainable["adapter"])
    scale = cfg.lora.scale

    enc = esmc_encode(esm_config, frozen["esm_encoder"],
                      batch["protein_input_ids"],
                      batch["protein_attention_mask"], attn_impl=attn_impl,
                      remat=cfg.remat, lora=trainable["lora_esm"],
                      lora_scale=scale)
    adapted = modality_adapter(adapter_config, adapter_params, enc,
                               deterministic=deterministic,
                               dropout_key=dropout_rng)
    llm_params = frozen["llm_decoder"]
    text_embeds = llm_params["embed_tokens"][batch["input_ids"]]
    inputs_embeds = placeholder_merge(
        text_embeds, batch["input_ids"], adapted,
        batch["protein_attention_mask"], cfg.placeholder_id)
    bias = causal_bias_from_mask(batch["attention_mask"])
    B, S = batch["input_ids"].shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    from ..models.decoder import contiguous_lengths

    h, _ = decoder_forward(
        decoder_core, llm_params, inputs_embeds=inputs_embeds, bias=bias,
        positions=positions, attn_impl=attn_impl, remat=cfg.remat,
        lora=trainable["lora_llm"], lora_scale=scale,
        attn_lengths=contiguous_lengths(batch["attention_mask"]))
    logits = decoder_logits(decoder_core, llm_params, h)
    return cross_entropy_loss(logits, batch["labels"])


def make_sft_train_step(
    *,
    esm_config: ESMCConfig,
    adapter_config: ModalityAdapterConfig,
    decoder_core: DecoderConfig,
    cfg: SFTConfig,
    tx,
    attn_impl: str = "xla",
    grad_accum: int = 1,
):
    """Returns jittable `step(state, frozen, batch, rng) -> (state, loss)`."""

    def loss_fn(trainable, batch, frozen, rng):
        return sft_loss(
            trainable, frozen, batch, esm_config=esm_config,
            adapter_config=adapter_config, decoder_core=decoder_core,
            cfg=cfg, deterministic=False, dropout_rng=rng,
            attn_impl=attn_impl)

    def step(state: TrainState, frozen, batch, rng):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, frozen, rng)
        else:
            def body(carry, mb):
                acc_loss, acc_grads, r = carry
                r, sub = jax.random.split(r)
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, mb, frozen, sub)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc_loss + loss, acc_grads, r), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), zeros, rng), batch)
            loss = loss / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
        new_state = apply_updates(state, grads, tx)
        return new_state, loss

    return step


def make_sft_eval_step(*, esm_config, adapter_config, decoder_core,
                       cfg: SFTConfig, attn_impl="xla"):
    """Deterministic loss-only step (reference eval_epoch,
    train_instruct.py:313-348)."""

    def step(trainable, frozen, batch):
        return sft_loss(
            trainable, frozen, batch, esm_config=esm_config,
            adapter_config=adapter_config, decoder_core=decoder_core,
            cfg=cfg, deterministic=True, attn_impl=attn_impl)

    return step
