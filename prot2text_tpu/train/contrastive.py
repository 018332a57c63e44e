"""Stage-1 contrastive alignment — ONE jitted SPMD step.

Reimplements reference scripts/train_contrast.py as a single pjit program
(SURVEY.md §7 step 6):
  * protein embedding: frozen ESMC encode → trainable ModalityAdapter →
    "mix" readout = concat(mean, std) pooling (:198-281) → L2-norm
  * text embedding: FROZEN decoder truncated at layer `output_llm_layer`
    (default 16, :288) → "mix" readout → L2-norm.  Unlike the reference —
    which runs the full 40-layer Qwen with output_hidden_states=True and
    throws away layers 17..40 — we scan only the first 16 layer params:
    same numbers, ~60% less decoder compute.
  * SegmentedBatchInfoNCELoss (τ=0.05): segment×batch similarity with
    integer labels (:94-114); segments bound the similarity-matrix size
    (`contrastive_num_segments`, default 2, :64).
  * Cross-chip negatives: the loss is written over the GLOBAL batch; with the
    batch sharded over the mesh's data axes, XLA inserts the all-gather of
    both embedding sets over ICI — strictly more negatives than the
    reference's per-GPU batch (SURVEY.md §2.4 last row).
  * grad psum is implicit: the jitted step differentiates the global-mean
    loss; no DDP wrapper, no barriers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.adapters import ModalityAdapterConfig, modality_adapter
from ..models.decoder import DecoderConfig, causal_bias_from_mask
from ..models.esmc import ESMCConfig, esmc_encode
from .optim import TrainState, apply_updates


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    temperature: float = 0.05          # train_contrast.py:82
    num_segments: int = 2              # :64
    output_llm_layer: int = 16         # :288
    readout: str = "mix"               # :198-248
    # parity quirk: the reference pools adapter outputs with an all-ones mask
    # (pads included, :262-270); set False to pool valid tokens only.
    mask_aware_protein_readout: bool = False


def readout_embeddings(embeddings, attention_mask, readout_fn: str = "mix"):
    """(B, S, H) + (B, S) → (B, H) or (B, 2H) for "mix".
    Mirrors reference readout_embeddings (train_contrast.py:198-248)."""
    mask = attention_mask.astype(jnp.float32)
    if readout_fn == "last":
        idx = mask.sum(axis=1).astype(jnp.int32) - 1
        return jnp.take_along_axis(
            embeddings, idx[:, None, None], axis=1)[:, 0]
    masked = embeddings.astype(jnp.float32) * mask[..., None]
    count = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    mean = masked.sum(axis=1) / count
    if readout_fn == "mean":
        return mean
    diff2 = jnp.square(embeddings.astype(jnp.float32) - mean[:, None, :])
    var = (diff2 * mask[..., None]).sum(axis=1) / count
    std = jnp.sqrt(var)
    if readout_fn == "std":
        return std
    if readout_fn == "mix":
        return jnp.concatenate([mean, std], axis=1)
    raise ValueError(readout_fn)


def _l2(x, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def batch_infonce_loss(z1, z2, temperature: float = 0.05):
    """In-batch InfoNCE, positives on the diagonal
    (BatchInfoNCELoss, train_contrast.py:72-91)."""
    logits = (z1 @ z2.T) / temperature
    return -jnp.mean(jax.nn.log_softmax(logits, axis=1).diagonal())


def segmented_infonce_loss(seg_z1, batch_z2, labels, temperature: float = 0.05):
    """(segment × batch) similarity with integer labels
    (SegmentedBatchInfoNCELoss, train_contrast.py:94-114)."""
    logits = (seg_z1 @ batch_z2.T) / temperature
    logp = jax.nn.log_softmax(logits, axis=1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)


def text_hidden_at_layer(core: DecoderConfig, decoder_params, input_ids,
                         attention_mask, layer: int, attn_impl: str = "xla"):
    """Exact HF `hidden_states[layer]` (pre-final-norm) running ONLY the first
    `layer` layers — one shared block implementation (decoder_forward with
    `num_layers`/`final_norm` overrides), so decoder numerics can never
    drift from this path."""
    from ..models.decoder import contiguous_lengths, decoder_forward

    emb = decoder_params["embed_tokens"][input_ids]
    bias = causal_bias_from_mask(attention_mask)
    B, S = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    # frozen text tower runs under stop_gradient → forward-only: force
    # flash where eligible (wins at every causal S)
    h, _ = decoder_forward(
        core, decoder_params, inputs_embeds=emb, bias=bias,
        positions=positions,
        attn_impl="flash" if attn_impl == "auto" else attn_impl,
        attn_lengths=contiguous_lengths(attention_mask),
        num_layers=layer, final_norm=False)
    return h


def contrastive_loss(
    adapter_params,
    frozen: dict,            # {"esm_encoder", "llm_decoder"}
    batch: dict,             # protein_input_ids/mask, description ids/mask
    *,
    esm_config: ESMCConfig,
    adapter_config: ModalityAdapterConfig,
    decoder_core: DecoderConfig,
    cfg: ContrastiveConfig,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
):
    """Global-batch segmented InfoNCE (differentiable in adapter params only)."""
    # frozen text tower
    text_h = text_hidden_at_layer(
        decoder_core, frozen["llm_decoder"], batch["description_input_ids"],
        batch["description_attention_mask"], cfg.output_llm_layer, attn_impl)
    text_z = readout_embeddings(
        jax.lax.stop_gradient(text_h), batch["description_attention_mask"],
        cfg.readout)
    text_z = _l2(text_z)

    # protein tower (adapter trainable)
    enc = esmc_encode(esm_config, frozen["esm_encoder"],
                      batch["protein_input_ids"],
                      batch["protein_attention_mask"], attn_impl=attn_impl)
    enc = jax.lax.stop_gradient(enc)
    adapted = modality_adapter(adapter_config, adapter_params, enc,
                               deterministic=deterministic,
                               dropout_key=dropout_rng)
    if cfg.mask_aware_protein_readout:
        prot_mask = batch["protein_attention_mask"]
    else:
        prot_mask = jnp.ones_like(batch["protein_attention_mask"])
    prot_z = _l2(readout_embeddings(adapted, prot_mask, cfg.readout))

    B = prot_z.shape[0]
    n_seg = cfg.num_segments
    seg = B // n_seg
    loss = 0.0
    for s in range(n_seg):
        seg_z = jax.lax.dynamic_slice_in_dim(prot_z, s * seg, seg, axis=0)
        labels = s * seg + jnp.arange(seg)
        loss = loss + segmented_infonce_loss(
            seg_z, text_z, labels, cfg.temperature)
    return loss / n_seg


def make_contrastive_train_step(
    *,
    esm_config: ESMCConfig,
    adapter_config: ModalityAdapterConfig,
    decoder_core: DecoderConfig,
    cfg: ContrastiveConfig,
    tx,
    attn_impl: str = "xla",
    grad_accum: int = 1,
    deterministic: bool = False,
):
    """Returns jittable `step(state, frozen, batch, rng) -> (state, loss)`.
    With grad_accum > 1, batch leading dims are (n_micro, micro_bsz, ...)."""

    def loss_fn(adapter_params, batch, frozen, rng):
        return contrastive_loss(
            adapter_params, frozen, batch,
            esm_config=esm_config, adapter_config=adapter_config,
            decoder_core=decoder_core, cfg=cfg,
            deterministic=deterministic, dropout_rng=rng,
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


def make_contrastive_eval_step(*, esm_config, adapter_config, decoder_core,
                               cfg: ContrastiveConfig, attn_impl="xla"):
    """Deterministic loss-only step (reference eval_epoch,
    train_contrast.py:483-519)."""

    def step(adapter_params, frozen, batch):
        return contrastive_loss(
            adapter_params, frozen, batch, esm_config=esm_config,
            adapter_config=adapter_config, decoder_core=decoder_core,
            cfg=cfg, deterministic=True, attn_impl=attn_impl)

    return step
