"""Grouped-query decode attention over the stacked KV cache (Pallas TPU).

Single-token decode attention is a pure cache-streaming op: per step and
layer it reads the full (B, Hkv, T, D) k/v slices once and does a few
KFLOPs per byte.  The XLA einsum path measures ~560 GB/s at the 8B B=128
flagship (scripts/bench_decode_decomp.py); this kernel streams the layer's
cache tiles straight from the STACKED (L, B, Hkv, T, D) buffer via
scalar-prefetch layer indexing (same trick as the stacked quant matmuls —
a `dynamic_index_in_dim` operand materializes a copy) and keeps the whole
(q·Kᵀ → masked softmax → ·V) chain in VMEM per (batch, head) tile.

The CURRENT token's k/v ride in as separate (B, Hkv, D) operands and are
folded into the softmax as one extra logit column — the cache itself stays
read-only here (the slot write remains the aliased cache_update kernel).

Numerics match models/decoder.decoder_decode_step's XLA path: fp32 logits
(callers pre-scale q), -inf masking from kv_mask, fp32 softmax, bf16·bf16
weighted sum with fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(jnp.finfo(jnp.float32).min)


def _kernel(idx_ref, q_ref, kn_ref, vn_ref, mask_ref, ck_ref, cv_ref, o_ref,
            *, rep: int):
    # blocks: q (1, Hkv, rep, D); kn/vn (1, Hkv, D); mask FULL (B, T) (a
    # (1, T) block would put 1 in the sublane dim — Mosaic-illegal; the
    # whole mask is tiny, the program row-selects it);
    # ck/cv (1, 1, Hkv, T, D) for layer idx; out (1, Hkv, rep, D)
    del idx_ref
    b = pl.program_id(0)
    ck = ck_ref[0, 0]                                   # (Hkv, T, D)
    cv = cv_ref[0, 0]
    q = q_ref[0]                                        # (Hkv, rep, D)
    logits = jax.lax.dot_general(
        q, ck, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, T)
    mask = mask_ref[b]                                  # (T,)
    logits = jnp.where(mask[None, None, :] > 0, logits, NEG)
    # new-token logit as a multiply-reduce (Mosaic's tpu.matmul requires a
    # vector-like rhs for this shape; the VPU lane reduce is trivial here)
    ln = jnp.sum(q.astype(jnp.float32)
                 * kn_ref[0].astype(jnp.float32)[:, None, :],
                 axis=-1)                               # (Hkv, rep)
    m = jnp.maximum(jnp.max(logits, axis=-1), ln)       # (Hkv, rep)
    el = jnp.exp(logits - m[..., None])                 # (Hkv, rep, T)
    en = jnp.exp(ln - m)                                # (Hkv, rep)
    denom = jnp.sum(el, axis=-1) + en
    a = jax.lax.dot_general(
        el.astype(cv.dtype), cv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, D)
    a = a + en[..., None] * vn_ref[0].astype(jnp.float32)[:, None, :]
    o_ref[0] = (a / denom[..., None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_stacked(qg, ck_all, cv_all, kv_mask, k_new, v_new,
                             layer, *, interpret: bool = False):
    """qg: (B, Hkv, rep, D) pre-scaled; ck_all/cv_all: (L, B, Hkv, T, D);
    kv_mask: (B, T) 0/1 over already-written slots; k_new/v_new:
    (B, Hkv, D) current token; layer: scalar int32.
    Returns (B, Hkv, rep, D) in qg's dtype."""
    L, B, Hkv, T, D = ck_all.shape
    rep = qg.shape[2]
    idx = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((B, T), lambda b, idx: (0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, idx: (idx[0], b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, rep=rep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), qg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(idx, qg, k_new, v_new, kv_mask.astype(jnp.int32), ck_all, cv_all)


def supports_decode_attention(cfg, cache_shape) -> bool:
    """bktd layout (D=128 flagships), whole-head tile fits VMEM."""
    L, B, Hkv, T, D = cache_shape
    tile_bytes = 2 * Hkv * T * D * 2
    return D % 128 == 0 and T % 8 == 0 and tile_bytes <= 24 * 1024 * 1024
