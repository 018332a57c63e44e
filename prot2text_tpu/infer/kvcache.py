"""Preallocated KV cache for batched autoregressive decoding.

Replaces HF GenerationMixin's DynamicCache (reference decode loop at
generate_instruct.py:72-87): shapes are fixed at (L, B, Hkv, T_max, D), so the
prefill and every decode step compile once and the whole loop runs device-side
under `lax.while_loop`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.decoder import DecoderConfig


def init_kv_cache(cfg: DecoderConfig, batch_size: int, max_length: int,
                  dtype=jnp.float32):
    """Cache layout (L, T, B, Hkv, D): sequence-leading after the layer dim,
    so the per-step decode write is a near-contiguous (L, 1, B, Hkv, D) slab
    (profiler-driven — strided slot writes forced XLA into full-cache
    copies)."""
    shape = (cfg.num_layers, max_length, batch_size, cfg.num_kv_heads,
             cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
