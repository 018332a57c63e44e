"""Medusa-style learned draft heads for speculative decoding.

Beyond reference parity: the reference decodes one token per target
forward (HF GenerationMixin, /root/reference/scripts/generate_instruct.py:72-87).
The serving engine already verifies gamma-token drafts in one chunk
forward with per-row acceptance (infer/serving._spec_rounds); this module
supplies a LEARNED draft source: K residual-MLP heads read the target's
frontier hidden state and each predicts one future token (head k predicts
the token k+1 positions past the frontier, PAPERS.md Medusa/EAGLE family).

TPU-first design choices vs the torch implementations:
- drafting is ONE batched einsum over the stacked (K, H, H) head kernels
  + the target's own lm_head — no per-head Python loop, no draft KV
  cache, no autoregressive draft loop, so the draft cost inside the
  jitted serving round is a few (B, H) matmuls;
- heads reuse `decoder_logits` (tied/quantized/bf16 lm_head all work);
- zero-init makes a fresh head draft the frontier token itself
  (residual passthrough -> argmax(lm_head(h)) = the token the target
  just emitted), so untrained heads are safe (verification keeps greedy
  exactness for ANY draft) and training only ever improves acceptance.

Greedy-exactness for any head weights is the acceptance rule's property,
tested in tests/test_medusa.py alongside the training step
(train/draft.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MedusaConfig:
    hidden_size: int
    num_heads: int = 4          # = draft length gamma


def init_medusa_params(cfg: MedusaConfig, key, dtype=jnp.float32,
                       scale: float = 0.0):
    """Stacked head params {"w": (K, H, H), "b": (K, H)}.  scale=0 (the
    Medusa-paper init) makes every head an identity residual block."""
    w = (scale * jax.random.normal(
        key, (cfg.num_heads, cfg.hidden_size, cfg.hidden_size), dtype)
        if scale else
        jnp.zeros((cfg.num_heads, cfg.hidden_size, cfg.hidden_size), dtype))
    return {"w": w, "b": jnp.zeros((cfg.num_heads, cfg.hidden_size), dtype)}


def medusa_hidden(med_params, h):
    """h: (..., H) frontier hidden states -> (..., K, H) per-head drafts
    of the hidden state k+1 positions ahead: h + SiLU(h W_k + b_k)."""
    w = med_params["w"].astype(h.dtype)
    b = med_params["b"].astype(h.dtype)
    proj = jnp.einsum("...h,khj->...kj", h, w) + b
    return h[..., None, :] + jax.nn.silu(proj)


def medusa_drafts(dec_cfg, dec_params, med_params, h):
    """Greedy drafts from the frontier hidden state.

    h: (B, H) -> (B, K) int32; draft k is head k's argmax through the
    TARGET's lm_head (decoder_logits handles tied / quantized heads)."""
    from .decoder import decoder_logits

    hm = medusa_hidden(med_params, h)                    # (B, K, H)
    logits = decoder_logits(dec_cfg, dec_params, hm)     # (B, K, V)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
