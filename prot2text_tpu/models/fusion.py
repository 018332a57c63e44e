"""Multimodal fusion: placeholder-token replacement and legacy concat.

`placeholder_merge` reproduces the reference's boolean-mask assignment
    inputs_embeds[input_ids == placeholder_id] = encoder_hidden[encoder_mask]
(models/modeling_esm2llama_instruct.py:136-138, esmc_qwen_arc.py:144) under
jit with FIXED shapes (SURVEY.md §7 hard part #2): for each row, the k-th
placeholder position receives the k-th valid encoder token.  Both sides use
cumsum-derived ordinal indices and a gather — no dynamic shapes.

`concat_fusion` reproduces the legacy `_concatenate_encoder_decoder_input`
(models/modeling_esm2llama_legacy.py:294-360): encoder embeds are prepended to
text embeds, the attention mask extended, and labels prefixed with -100.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def placeholder_merge(
    inputs_embeds,         # (B, S, H) text embeddings
    input_ids,             # (B, S) int
    encoder_hidden,        # (B, P, H) adapter outputs (right-padded)
    encoder_attention_mask,  # (B, P) 0/1
    placeholder_id: int,
):
    """Returns (B, S, H) with placeholder rows replaced by encoder tokens.

    Row-wise semantics (matching the torch boolean-mask assignment for
    correctly-formed batches where counts agree — the reference raises
    otherwise, esmc_qwen_arc.py:134-141): the n-th placeholder in row b is
    replaced by the n-th unmasked encoder token of row b.
    """
    ph = (input_ids == placeholder_id)                       # (B, S)
    # ordinal of each placeholder within its row: 0,1,2,...
    ph_ord = jnp.cumsum(ph.astype(jnp.int32), axis=1) - 1    # (B, S)
    ph_ord = jnp.clip(ph_ord, 0, None)

    emask = encoder_attention_mask.astype(bool)              # (B, P)
    # position of the n-th valid encoder token per row
    enc_ord = jnp.cumsum(emask.astype(jnp.int32), axis=1) - 1  # (B, P)
    P = encoder_hidden.shape[1]
    # scatter valid encoder tokens into ordinal-indexed buffer
    # buffer[b, enc_ord[b, p]] = encoder_hidden[b, p] for valid p
    scatter_idx = jnp.where(emask, enc_ord, P - 1)
    order = jnp.argsort(
        jnp.where(emask, enc_ord, P + jnp.arange(P)[None, :]), axis=1
    )  # valid tokens first, in order
    del scatter_idx
    compacted = jnp.take_along_axis(encoder_hidden, order[..., None], axis=1)

    # gather the ordinal-th compacted encoder token for each placeholder slot
    gather_idx = jnp.clip(ph_ord, 0, P - 1)
    merged = jnp.take_along_axis(compacted, gather_idx[..., None], axis=1)
    return jnp.where(ph[..., None], merged.astype(inputs_embeds.dtype),
                     inputs_embeds)


def count_check(input_ids, placeholder_id, encoder_attention_mask):
    """Per-row placeholder vs protein-token count equality (host-side check,
    mirroring the ValueError at esmc_qwen_arc.py:137-141)."""
    n_ph = (input_ids == placeholder_id).sum(axis=1)
    n_enc = encoder_attention_mask.sum(axis=1)
    return n_ph == n_enc


def concat_fusion(
    encoder_embeds,        # (B, P, H)
    encoder_attention_mask,  # (B, P)
    text_embeds,           # (B, S, H)
    text_attention_mask,   # (B, S)
    labels=None,           # (B, S) or None
    ignore_index: int = -100,
):
    """[enc ‖ text] along sequence, mask extended, labels prefixed -100."""
    embeds = jnp.concatenate([encoder_embeds.astype(text_embeds.dtype),
                              text_embeds], axis=1)
    mask = jnp.concatenate([encoder_attention_mask, text_attention_mask],
                           axis=1)
    if labels is None:
        return embeds, mask, None
    pad_labels = jnp.full(encoder_embeds.shape[:2], ignore_index,
                          dtype=labels.dtype)
    labels = jnp.concatenate([pad_labels, labels], axis=1)
    return embeds, mask, labels
