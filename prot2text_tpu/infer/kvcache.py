"""Preallocated KV cache for batched autoregressive decoding.

Replaces HF GenerationMixin's DynamicCache (reference decode loop at
generate_instruct.py:72-87): shapes are fixed, so the prefill and every
decode step compile once and the whole loop runs device-side under
`lax.while_loop`.

The physical layout is head-dim dependent (models/decoder.kv_cache_layout,
measured on v5e):
  * D=128 flagships → (L, B, Hkv, T, D) batch-leading: dense 128-lane tiles,
    every decode einsum a natural dot_general, no per-step layout repacks.
  * D=64 → (L, T, B, Hkv, D) sequence-leading: a trailing (T, 64) tile row
    is half-padded, so keeping T leading (dense) + the slab-write Pallas
    kernel wins despite XLA's transposed-layout copies.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.decoder import DecoderConfig, kv_cache_layout


def init_kv_cache(cfg: DecoderConfig, batch_size: int, max_length: int,
                  dtype=jnp.float32):
    if kv_cache_layout(cfg) == "bktd":
        shape = (cfg.num_layers, batch_size, cfg.num_kv_heads, max_length,
                 cfg.head_dim)
    else:
        shape = (cfg.num_layers, max_length, batch_size, cfg.num_kv_heads,
                 cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def batch_axis(cfg: DecoderConfig) -> int:
    """Axis of the batch dim in the cache arrays (beam expand/reorder)."""
    return 1 if kv_cache_layout(cfg) == "bktd" else 2
