"""Attention kernel dispatch.

`impl`:
  * "xla"   — reference XLA einsum attention, fp32 softmax (always available,
              exact; used for parity tests and CPU).
  * "flash" — Pallas TPU flash attention (kernels/flash_attention.py); falls
              back to "xla" off-TPU.

This replaces the cuDNN/SDPA kernels the reference consumes through
HF EsmModel / LlamaForCausalLM (reference models/modeling_esm2llama_instruct.py
:175-185, :204-215 — the native compute lives in torch; here it is Pallas/XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, bias):
    """q,k,v: (B, H, Sq|Skv, D). bias: fp32 additive, broadcastable to
    (B, H, Sq, Skv). Softmax in fp32, matmuls accumulate fp32."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def dot_product_attention(q, k, v, bias, impl: str = "xla"):
    if impl == "flash":
        try:
            from .flash_attention import flash_attention_tpu

            if jax.default_backend() == "tpu":
                return flash_attention_tpu(q, k, v, bias)
        except Exception:
            pass
        return _xla_attention(q, k, v, bias)
    return _xla_attention(q, k, v, bias)
