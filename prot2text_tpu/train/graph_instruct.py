"""Instruction SFT for the structure-graph variant
(Esm2Rgcn2LlamaInstructForCausalLM).

The reference defines the RGCN model (modeling_esm2rgcn2llama_instruct.py)
and decodes with it (generate_instruct.py) but ships no trainer for it; this
step completes the family: trainable = RGCN adapter + LoRA on the Llama
decoder, frozen = ESM2 encoder + Llama base.  Graphs ride as padded
flat-node-space tensors (data/collate_graph.py) so the whole step jits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.adapters import RgcnAdapterConfig, rgcn_adapter
from ..models.decoder import (
    DecoderConfig, causal_bias_from_mask, cross_entropy_loss, decoder_forward,
    decoder_logits,
)
from ..models.esm2 import ESM2Config, esm2_encode
from ..models.fusion import placeholder_merge
from ..models.lora import LoraConfig
from .optim import TrainState, apply_updates


@dataclasses.dataclass(frozen=True)
class GraphSFTConfig:
    lora: LoraConfig = LoraConfig()
    placeholder_id: int = 128003
    remat: bool = True


def graph_sft_loss(
    trainable: dict,              # {"adapter", "lora_llm"}
    frozen: dict,                 # {"esm_encoder", "llama_decoder"}
    batch: dict,
    *,
    esm_config: ESM2Config,
    adapter_config: RgcnAdapterConfig,
    decoder_core: DecoderConfig,
    cfg: GraphSFTConfig,
    deterministic: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
):
    enc = esm2_encode(esm_config, frozen["esm_encoder"],
                      batch["protein_input_ids"],
                      batch["protein_attention_mask"], attn_impl=attn_impl,
                      remat=cfg.remat)
    enc = jax.lax.stop_gradient(enc)
    adapted = rgcn_adapter(
        adapter_config, trainable["adapter"], enc,
        batch["protein_attention_mask"], batch["graph_edge_index"],
        batch["graph_edge_type"], batch["graph_edge_mask"],
        deterministic=deterministic, dropout_key=dropout_rng)
    llm = frozen["llama_decoder"]
    text_embeds = llm["embed_tokens"][batch["input_ids"]]
    inputs_embeds = placeholder_merge(
        text_embeds, batch["input_ids"], adapted,
        batch["protein_attention_mask"], cfg.placeholder_id)
    bias = causal_bias_from_mask(batch["attention_mask"])
    B, S = batch["input_ids"].shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    from ..models.decoder import contiguous_lengths

    h, _ = decoder_forward(
        decoder_core, llm, inputs_embeds=inputs_embeds, bias=bias,
        positions=positions, attn_impl=attn_impl, remat=cfg.remat,
        lora=trainable["lora_llm"], lora_scale=cfg.lora.scale,
        attn_lengths=contiguous_lengths(batch["attention_mask"]))
    logits = decoder_logits(decoder_core, llm, h)
    return cross_entropy_loss(logits, batch["labels"])


def make_graph_sft_train_step(*, esm_config, adapter_config, decoder_core,
                              cfg: GraphSFTConfig, tx,
                              attn_impl: str = "xla"):
    def loss_fn(trainable, batch, frozen, rng):
        return graph_sft_loss(
            trainable, frozen, batch, esm_config=esm_config,
            adapter_config=adapter_config, decoder_core=decoder_core,
            cfg=cfg, deterministic=False, dropout_rng=rng,
            attn_impl=attn_impl)

    def step(state: TrainState, frozen, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, frozen, rng)
        return apply_updates(state, grads, tx), loss

    return step
