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
                  dtype=jnp.float32, kv_bits=None):
    """kv_bits=8 allocates a QUANTIZED cache: int8 k/v plus per-(head,
    token)-vector fp32 scales under "k_scale"/"v_scale" (models/quant.py
    quantize_kv granularity).  Halves the per-step HBM bytes of the
    decode-attention cache read — the measured bandwidth floor of
    single-chip decode — at ~0.4% RMS logit error.  bktd layouts only
    (the D=128 flagships; the fused Pallas write kernel's int8 tile
    groups are 32 sublanes, so callers should size T % 32 == 0)."""
    if kv_cache_layout(cfg) == "bktd":
        shape = (cfg.num_layers, batch_size, cfg.num_kv_heads, max_length,
                 cfg.head_dim)
    else:
        shape = (cfg.num_layers, max_length, batch_size, cfg.num_kv_heads,
                 cfg.head_dim)
    if kv_bits is None:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if kv_bits != 8:
        raise ValueError(f"kv_bits must be 8 or None, got {kv_bits}")
    if kv_cache_layout(cfg) != "bktd":
        raise ValueError("int8 KV cache requires the bktd layout "
                         "(head_dim % 128 == 0 flagships)")
    sshape = shape[:-1]                       # (L, B, Hkv, T)
    return {"k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.ones(sshape, jnp.float32),
            "v_scale": jnp.ones(sshape, jnp.float32)}


def batch_axis(cfg: DecoderConfig) -> int:
    """Axis of the batch dim in the cache arrays (beam expand/reorder)."""
    return 1 if kv_cache_layout(cfg) == "bktd" else 2
