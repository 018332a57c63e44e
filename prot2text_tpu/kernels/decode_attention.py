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


def supports_decode_attention(cfg, cache_shape, cache_dtype=None) -> bool:
    """bktd layout (D=128 flagships), whole-head tile fits VMEM."""
    L, B, Hkv, T, D = cache_shape
    itemsize = 2 if cache_dtype is None else jnp.dtype(cache_dtype).itemsize
    tile_bytes = 2 * Hkv * T * D * itemsize
    return D % 128 == 0 and T % 8 == 0 and tile_bytes <= 24 * 1024 * 1024


def supports_decode_attention_write(cfg, cache_shape, cache_dtype=None):
    """Fused-write variant: the aliased slot write covers a 16-sublane
    bf16 tile group, so T must additionally be a multiple of 16."""
    return (supports_decode_attention(cfg, cache_shape, cache_dtype)
            and cache_shape[3] % 16 == 0)


# ---------------------------------------------------------------------------
# fused attention + cache slot write
#
# The standalone slot-write kernels (kernels/cache_update.py) read-modify-
# write one (8, D) tile group per (layer, batch, head) AGAIN from HBM —
# ~0.9 ms/step at the 8B B=128 flagship on top of the attention read.  But
# this kernel already has the full (Hkv, T, D) layer tile in VMEM, so the
# new slot's tile group can be written back through an ALIASED full-cache
# output whose block is just that (Hkv, 8, D) group: the RMW's read half is
# free and only the store bytes remain.  Slots are per-row (a (B,) vector,
# scalar-prefetched and indexed by the grid id inside the index_map — the
# paged-attention trick), so lockstep decode (all rows share one slot) and
# the serving engine's per-row slots go through the same kernel.


def _kernel_write(idx_ref, q_ref, kn_ref, vn_ref, mask_ref, ck_ref, cv_ref,
                  o_ref, cko_ref, cvo_ref, *, rep: int):
    b = pl.program_id(0)
    Hkv, T, D = ck_ref.shape[2], ck_ref.shape[3], ck_ref.shape[4]
    ck = ck_ref[0, 0]                                   # (Hkv, T, D)
    cv = cv_ref[0, 0]
    q = q_ref[0]                                        # (Hkv, rep, D)
    kn = kn_ref[0]                                      # (Hkv, D)
    vn = vn_ref[0]
    logits = jax.lax.dot_general(
        q, ck, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, T)
    mask = mask_ref[b]                                  # (T,)
    logits = jnp.where(mask[None, None, :] > 0, logits, NEG)
    ln = jnp.sum(q.astype(jnp.float32)
                 * kn.astype(jnp.float32)[:, None, :],
                 axis=-1)                               # (Hkv, rep)
    m = jnp.maximum(jnp.max(logits, axis=-1), ln)
    el = jnp.exp(logits - m[..., None])
    en = jnp.exp(ln - m)
    denom = jnp.sum(el, axis=-1) + en
    a = jax.lax.dot_general(
        el.astype(cv.dtype), cv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    a = a + en[..., None] * vn.astype(jnp.float32)[:, None, :]
    o_ref[0] = (a / denom[..., None]).astype(o_ref.dtype)

    # -- write the new slot's (Hkv, 16, D) tile group back ------------------
    # The stale group loads straight off the ref with a DYNAMIC pl.ds
    # (Mosaic lowers dynamic sublane starts on ref loads — proven by the
    # chunk-verify kernel rework; the one-hot MXU contraction this
    # replaces cost Hkv·16·T·D flops per side per (b, layer)).  bf16 TPU
    # tiles are 16 sublanes, so the group is 16 rows and the start is
    # 16-aligned — an 8-row group would start mid-tile for odd groups
    # (the int8 kernel below uses 32-row groups for the same reason).
    # Callers must size T % 16 == 0 (supports_decode_attention_write).
    slot = idx_ref[1 + b]
    tg = slot // 16
    r = slot - tg * 16
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hkv, 16, D), 1)
    old_k = ck_ref[0, 0, :, pl.ds(tg * 16, 16), :].astype(jnp.float32)
    old_v = cv_ref[0, 0, :, pl.ds(tg * 16, 16), :].astype(jnp.float32)
    cko_ref[0, 0] = jnp.where(
        rows == r, kn.astype(jnp.float32)[:, None, :], old_k
    ).astype(cko_ref.dtype)
    cvo_ref[0, 0] = jnp.where(
        rows == r, vn.astype(jnp.float32)[:, None, :], old_v
    ).astype(cvo_ref.dtype)


@functools.partial(jax.jit, donate_argnums=(1, 2),
                   static_argnames=("interpret",))
def decode_attention_stacked_write(qg, ck_all, cv_all, kv_mask, k_new, v_new,
                                   layer, slots, *, interpret: bool = False):
    """Fused decode attention + in-place KV slot write.

    qg: (B, Hkv, rep, D) pre-scaled; ck_all/cv_all: (L, B, Hkv, T, D),
    DONATED and updated in place; kv_mask: (B, T) 0/1 over already-written
    slots (the slot being written this step must be 0 — the current token's
    k/v ride in as the extra logit column); k_new/v_new: (B, Hkv, D);
    layer: scalar int32; slots: scalar or (B,) int32 cache slot per row.
    T % 16 == 0 (bf16 tile groups — supports_decode_attention_write).
    Returns (attn (B, Hkv, rep, D), ck_all, cv_all)."""
    L, B, Hkv, T, D = ck_all.shape
    rep = qg.shape[2]
    slots = jnp.broadcast_to(
        jnp.asarray(slots, jnp.int32).reshape(-1), (B,))
    idx = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), slots])
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
        out_specs=[
            pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, 16, D),
                         lambda b, idx: (idx[0], b, 0, idx[1 + b] // 16, 0)),
            pl.BlockSpec((1, 1, Hkv, 16, D),
                         lambda b, idx: (idx[0], b, 0, idx[1 + b] // 16, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_write, rep=rep),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep, D), qg.dtype),
            jax.ShapeDtypeStruct(ck_all.shape, ck_all.dtype),
            jax.ShapeDtypeStruct(cv_all.shape, cv_all.dtype),
        ],
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=interpret,
    )(idx, qg, k_new, v_new, kv_mask.astype(jnp.int32), ck_all, cv_all)


# ---------------------------------------------------------------------------
# int8 KV cache: fused dequant-attention + quantized slot write
#
# The decode-attention read IS the single-chip bandwidth floor (the bf16
# kernel above measures ~97% of HBM at the 8B flagship), so the remaining
# lever is fewer bytes: the cache stores int8 values + one fp32 scale per
# (head, token) vector (models/quant.quantize_kv).  Logits dequantize
# per COLUMN after the q·Kᵀ matmul (logits[h,r,t] · k_scale[h,t]); the
# value side folds v_scale into the softmax weights BEFORE the ·V matmul
# (sum_t w[t]·s[t]·v_int[t,d] is exact).  The int8→bf16 tile convert rides
# the same in-VMEM idiom as kernels/quant_matmul.  int8 tiles are 32
# sublanes, so the slot write's aliased output block is a (Hkv, 32, D)
# tile group and callers must size T % 32 == 0.
# ---------------------------------------------------------------------------


def _kernel_write_q(idx_ref, q_ref, knq_ref, vnq_ref, kns_ref, vns_ref,
                    mask_ref, ck_ref, cv_ref, sk_ref, sv_ref,
                    o_ref, cko_ref, cvo_ref, sko_ref, svo_ref, *, rep: int):
    b = pl.program_id(0)
    Hkv, T, D = ck_ref.shape[2], ck_ref.shape[3], ck_ref.shape[4]
    ckf = ck_ref[0, 0].astype(jnp.bfloat16)             # (Hkv, T, D) exact
    cvf = cv_ref[0, 0].astype(jnp.bfloat16)
    sk = sk_ref[0, 0]                                   # (Hkv, T) f32
    sv = sv_ref[0, 0]
    q = q_ref[0]                                        # (Hkv, rep, D)
    knq = knq_ref[0]                                    # (Hkv, D) f32 ints
    vnq = vnq_ref[0]
    kns = kns_ref[b]                                    # (Hkv,) f32
    vns = vns_ref[b]
    logits = jax.lax.dot_general(
        q, ckf, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, T)
    logits = logits * sk[:, None, :]
    mask = mask_ref[b]                                  # (T,)
    logits = jnp.where(mask[None, None, :] > 0, logits, NEG)
    knf = knq * kns[:, None]                            # dequant (Hkv, D)
    ln = jnp.sum(q.astype(jnp.float32) * knf[:, None, :], axis=-1)
    m = jnp.maximum(jnp.max(logits, axis=-1), ln)       # (Hkv, rep)
    el = jnp.exp(logits - m[..., None])                 # (Hkv, rep, T)
    en = jnp.exp(ln - m)
    denom = jnp.sum(el, axis=-1) + en
    a = jax.lax.dot_general(
        (el * sv[:, None, :]).astype(jnp.bfloat16), cvf,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, D)
    a = a + (en * vns[:, None])[..., None] * vnq[:, None, :]
    o_ref[0] = (a / denom[..., None]).astype(o_ref.dtype)

    # -- quantized slot write: (Hkv, 32, D) int8 tile group ------------------
    # The stale group loads straight off the int8 ref with a DYNAMIC
    # 32-aligned pl.ds (Mosaic lowers dynamic sublane starts on ref
    # loads); the one-hot MXU contraction this replaces cost Hkv·32·T·D
    # flops per side per (b, layer) — more than the attention math itself
    slot = idx_ref[1 + b]
    tg = slot // 32
    r = slot - tg * 32
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hkv, 32, D), 1)
    old_k = ck_ref[0, 0, :, pl.ds(tg * 32, 32), :].astype(jnp.float32)
    old_v = cv_ref[0, 0, :, pl.ds(tg * 32, 32), :].astype(jnp.float32)
    cko_ref[0, 0] = jnp.where(rows == r, knq[:, None, :], old_k
                              ).astype(jnp.int8)
    cvo_ref[0, 0] = jnp.where(rows == r, vnq[:, None, :], old_v
                              ).astype(jnp.int8)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T), 1)
    sko_ref[0, 0] = jnp.where(cols == slot, kns[:, None], sk)
    svo_ref[0, 0] = jnp.where(cols == slot, vns[:, None], sv)


@functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4),
                   static_argnames=("interpret",))
def decode_attention_stacked_write_q(qg, ck_all, cv_all, sk_all, sv_all,
                                     kv_mask, k_new_q, v_new_q, k_new_s,
                                     v_new_s, layer, slots, *,
                                     interpret: bool = False):
    """Fused int8-KV decode attention + in-place quantized slot write.

    qg: (B, Hkv, rep, D) pre-scaled bf16; ck_all/cv_all: (L, B, Hkv, T, D)
    int8 and sk_all/sv_all: (L, B, Hkv, T) f32, all four DONATED and
    updated in place; kv_mask: (B, T) 0/1 over already-written slots (the
    slot written this step must be 0); k_new_q/v_new_q: (B, Hkv, D) fp32
    EXACT-INT quantized values with k_new_s/v_new_s (B, Hkv) f32 scales
    (models/quant.quantize_kv of the current token); layer: scalar int32;
    slots: scalar or (B,) int32.  T % 32 == 0 (int8 tile groups).
    Returns (attn (B, Hkv, rep, D), ck_all, cv_all, sk_all, sv_all)."""
    L, B, Hkv, T, D = ck_all.shape
    rep = qg.shape[2]
    slots = jnp.broadcast_to(
        jnp.asarray(slots, jnp.int32).reshape(-1), (B,))
    idx = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), slots])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((B, Hkv), lambda b, idx: (0, 0)),
            pl.BlockSpec((B, Hkv), lambda b, idx: (0, 0)),
            pl.BlockSpec((B, T), lambda b, idx: (0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, idx: (idx[0], b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, 32, D),
                         lambda b, idx: (idx[0], b, 0, idx[1 + b] // 32, 0)),
            pl.BlockSpec((1, 1, Hkv, 32, D),
                         lambda b, idx: (idx[0], b, 0, idx[1 + b] // 32, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, idx: (idx[0], b, 0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_write_q, rep=rep),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep, D), qg.dtype),
            jax.ShapeDtypeStruct(ck_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(cv_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(sk_all.shape, jnp.float32),
            jax.ShapeDtypeStruct(sv_all.shape, jnp.float32),
        ],
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=interpret,
    )(idx, qg,
      k_new_q.astype(jnp.float32), v_new_q.astype(jnp.float32),
      k_new_s.astype(jnp.float32), v_new_s.astype(jnp.float32),
      kv_mask.astype(jnp.int32), ck_all, cv_all, sk_all, sv_all)


def supports_decode_attention_q(cfg, cache_shape) -> bool:
    """int8-KV fused kernel eligibility: bktd D=128 flagships, T sized to
    the 32-sublane int8 tile groups, per-(batch, layer) working set (int8
    tiles + their bf16 converts) within VMEM."""
    L, B, Hkv, T, D = cache_shape
    tile_bytes = 2 * Hkv * T * D * (1 + 2)     # int8 read + bf16 convert
    return D % 128 == 0 and T % 32 == 0 and tile_bytes <= 20 * 1024 * 1024


# ---------------------------------------------------------------------------
# fused CHUNK-verify attention + int8 cache chunk write (speculative serving)
#
# The serving engine's prompt-lookup verify (infer/serving._spec_rounds)
# forwards a G=gamma+1-token chunk per slot at PER-ROW cache columns.  The
# generic decoder_forward path costs ~5x a fused single-token step at the
# 8B flagship: it dequantizes the int8 cache to bf16 per layer, rewrites
# the full cache through scan ys, and runs XLA einsum attention.  This
# kernel is the chunk generalization of decode_attention_stacked_write_q:
# the layer's int8 tiles stream once, the chunk's G queries (G·rep rows)
# run [stale-cache logits ‖ intra-chunk causal logits] with the masked
# fp32 softmax in VMEM, and the chunk's G consecutive slots are written
# in place through aliased outputs.
#
# GRID SHAPE (round-3 continuation): the grid is (B, 2) with a STATIC
# inner loop over the Hkv heads.  The first version gridded (B, Hkv, 2) to
# bound VMEM (a full-(Hkv) tile pair + one (Hkv·GR, T) fp32 logits tensor
# measured 23 MB at T~1.9k) — but 256 tiny grid steps/layer cost ~0.85 µs
# each (scripts/bench_spec_weights.py: 13.1 ms/round at T=1920, 6.9 ms of
# pure grid overhead at T=64, vs 5.0 ms for the 16-step single-token
# kernel on the SAME cache bytes).  The head loop keeps per-head temps
# (bf16 tile converts, (GR, T) logits) scoped to one iteration — peak VMEM
# is the double-buffered int8 tile pair (~7.9 MB) + one head's working set
# — while the grid drops to 32 steps/layer.  A chunk may span TWO
# 32-sublane int8 tile groups (G <= 32) but ONE aliased output operand can
# only address one group per step, so iteration j=0 does ALL the work
# (attention, scale rows, both groups' stale-extract+insert — group 1
# stashed in VMEM scratch, which persists across grid steps) and writes
# group slot//32; j=1 only copies the scratch out to group slot//32 + 1
# (the input tile blocks ignore j, so nothing is refetched or
# reconverted).  Callers must size T % 32 == 0 and guarantee
# slot <= T - 64.
# ---------------------------------------------------------------------------


def _kernel_verify_qc(idx_ref, q_ref, knq_ref, vnq_ref, kns_ref, vns_ref,
                      mask_ref, ck_ref, cv_ref, sk_ref, sv_ref,
                      o_ref, cko_ref, cvo_ref, sko_ref, svo_ref,
                      g1k_ref, g1v_ref, *, rep: int, G: int, Hkv: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    T, D = ck_ref.shape[3], ck_ref.shape[4]
    GR = G * rep
    slot = idx_ref[1 + b]                               # chunk start column
    tg0 = slot // 32

    @pl.when(j == 1)
    def _():
        # group slot//32 + 1: stale+insert already computed at j=0
        cko_ref[0, 0] = g1k_ref[...]
        cvo_ref[0, 0] = g1v_ref[...]

    @pl.when(j == 0)
    def _():
        mask = mask_ref[b]                              # (T,)
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        rowg = jax.lax.broadcasted_iota(jnp.int32, (GR, G), 0) // rep
        colg = jax.lax.broadcasted_iota(jnp.int32, (GR, G), 1)
        rows32 = jax.lax.broadcasted_iota(jnp.int32, (32, D), 0)

        for h in range(Hkv):                            # static head loop
            ckf = ck_ref[0, 0, h].astype(jnp.bfloat16)  # (T, D) exact
            cvf = cv_ref[0, 0, h].astype(jnp.bfloat16)
            sk = sk_ref[0, 0, pl.ds(h, 1), :]           # (1, T) f32
            sv = sv_ref[0, 0, pl.ds(h, 1), :]
            knq = knq_ref[0, h]                         # (G, D) f32 ints
            vnq = vnq_ref[0, h]
            kns = kns_ref[b, pl.ds(h, 1), :]            # (1, G) f32
            vns = vns_ref[b, pl.ds(h, 1), :]

            q = q_ref[0, h]                             # (G·rep, D) bf16
            logits = jax.lax.dot_general(
                q, ckf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (GR, T)
            logits = logits * sk
            logits = jnp.where(mask[None, :] > 0, logits, NEG)
            # q·(knq_g·kns_g) == (q·knq_g)·kns_g — scale the logit column
            # instead of dequantizing the key (no (G, D) knf temp)
            ln = jax.lax.dot_general(
                q.astype(jnp.float32), knq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * kns   # (GR, G)
            ln = jnp.where(colg <= rowg, ln, NEG)       # intra-chunk causal
            m = jnp.maximum(jnp.max(logits, axis=-1), jnp.max(ln, axis=-1))
            el = jnp.exp(logits - m[:, None])           # (GR, T)
            en = jnp.exp(ln - m[:, None])               # (GR, G)
            denom = jnp.sum(el, axis=-1) + jnp.sum(en, axis=-1)
            a = jax.lax.dot_general(
                (el * sv).astype(jnp.bfloat16), cvf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (GR, D)
            a = a + jax.lax.dot_general(
                en * vns, vnq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, h] = (a / denom[:, None]).astype(o_ref.dtype)

            # scale rows: G is small and static, so unrolled selects beat
            # one-hot matmuls
            snewk = sk
            snewv = sv
            for g in range(G):
                snewk = jnp.where(cols1 == slot + g, kns[0, g], snewk)
                snewv = jnp.where(cols1 == slot + g, vns[0, g], snewv)
            sko_ref[0, 0, pl.ds(h, 1), :] = snewk
            svo_ref[0, 0, pl.ds(h, 1), :] = snewv

            # -- int8 chunk write: both spanned tile groups in one pass.
            # The stale groups load straight off the int8 ref with a
            # DYNAMIC 32-aligned pl.ds (Mosaic lowers dynamic sublane
            # starts on ref loads; it is value-level dynamic_slice that
            # doesn't lower) — the previous one-hot MXU extraction cost
            # 4 (32, T)x(T, D) contractions per head, ~3x the attention
            # math itself at 25% MXU utilization.  Group 0 goes straight
            # to the aliased output; group 1 waits in scratch for j=1.
            for jj in range(2):
                tg = tg0 + jj
                r = slot - tg * 32    # chunk start row within THIS group
                old_k = ck_ref[0, 0, h, pl.ds(tg * 32, 32), :].astype(
                    jnp.float32)                                 # (32, D)
                old_v = cv_ref[0, 0, h, pl.ds(tg * 32, 32), :].astype(
                    jnp.float32)
                new_k = old_k
                new_v = old_v
                for g in range(G):
                    new_k = jnp.where(rows32 == r + g, knq[g][None, :],
                                      new_k)
                    new_v = jnp.where(rows32 == r + g, vnq[g][None, :],
                                      new_v)
                if jj == 0:
                    cko_ref[0, 0, h] = new_k.astype(jnp.int8)
                    cvo_ref[0, 0, h] = new_v.astype(jnp.int8)
                else:
                    g1k_ref[h] = new_k.astype(jnp.int8)
                    g1v_ref[h] = new_v.astype(jnp.int8)


@functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4),
                   static_argnames=("interpret",))
def decode_attention_stacked_verify_qc(qg, ck_all, cv_all, sk_all, sv_all,
                                       kv_mask, k_new_q, v_new_q, k_new_s,
                                       v_new_s, layer, slots, *,
                                       interpret: bool = False):
    """Fused int8-KV CHUNK-verify attention + in-place chunk write.

    qg: (B, Hkv, G·rep, D) pre-scaled bf16, row g·rep+r = query token g,
    head replica r; ck_all/cv_all: (L, B, Hkv, T, D) int8 and
    sk_all/sv_all: (L, B, Hkv, T) f32, all four DONATED and updated in
    place; kv_mask: (B, T) 0/1 over already-written slots (the chunk's own
    columns must be 0); k_new_q/v_new_q: (B, Hkv, G, D) fp32 EXACT-INT
    quantized chunk keys/values with k_new_s/v_new_s (B, Hkv, G) f32
    scales (models/quant.quantize_kv); layer: scalar int32; slots: (B,)
    int32 chunk-start columns with slots[b] <= T - 64.  T % 32 == 0.
    Returns (attn (B, Hkv, G·rep, D), ck_all, cv_all, sk_all, sv_all)."""
    L, B, Hkv, T, D = ck_all.shape
    G = k_new_q.shape[2]
    GR = qg.shape[2]
    rep = GR // G
    slots = jnp.broadcast_to(
        jnp.asarray(slots, jnp.int32).reshape(-1), (B,))
    idx = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), slots])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, 2),
        in_specs=[
            pl.BlockSpec((1, Hkv, GR, D), lambda b, j, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, G, D), lambda b, j, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, G, D), lambda b, j, idx: (b, 0, 0, 0)),
            pl.BlockSpec((B, Hkv, G), lambda b, j, idx: (0, 0, 0)),
            pl.BlockSpec((B, Hkv, G), lambda b, j, idx: (0, 0, 0)),
            pl.BlockSpec((B, T), lambda b, j, idx: (0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, j, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, j, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, j, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, j, idx: (idx[0], b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, GR, D), lambda b, j, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, 32, D),
                         lambda b, j, idx: (idx[0], b, 0,
                                            idx[1 + b] // 32 + j, 0)),
            pl.BlockSpec((1, 1, Hkv, 32, D),
                         lambda b, j, idx: (idx[0], b, 0,
                                            idx[1 + b] // 32 + j, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, j, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, j, idx: (idx[0], b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hkv, 32, D), jnp.int8),
            pltpu.VMEM((Hkv, 32, D), jnp.int8),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_verify_qc, rep=rep, G=G, Hkv=Hkv),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, GR, D), qg.dtype),
            jax.ShapeDtypeStruct(ck_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(cv_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(sk_all.shape, jnp.float32),
            jax.ShapeDtypeStruct(sv_all.shape, jnp.float32),
        ],
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True),
        interpret=interpret,
    )(idx, qg,
      k_new_q.astype(jnp.float32), v_new_q.astype(jnp.float32),
      k_new_s.astype(jnp.float32), v_new_s.astype(jnp.float32),
      kv_mask.astype(jnp.int32), ck_all, cv_all, sk_all, sv_all)


def supports_verify_chunk(cfg, cache_shape, G: int) -> bool:
    """Chunk-verify kernel eligibility: bktd D=128 flagships, 32-group T,
    per-batch working set in VMEM — the full-(Hkv) int8 tile pair is
    double-buffered across grid steps; the bf16 converts and fp32 logits
    are per-head temporaries of the static head loop."""
    L, B, Hkv, T, D = cache_shape
    GR = G * (cfg.num_heads // cfg.num_kv_heads)
    tile_bytes = (2 * 2 * Hkv * T * D              # int8 pair, dbuffered
                  + 2 * T * D * 2                  # one head's bf16 pair
                  + 3 * GR * T * 4                 # logits/el/el·sv (f32)
                  + 4 * 32 * D * 4                 # stale tile groups (f32,
                                                   #  k+v × ≤2 groups)
                  + 8 * T * 4)                     # scale rows
    return (D % 128 == 0 and T % 32 == 0 and T >= 64 and G <= 32
            and tile_bytes <= 14 * 1024 * 1024)


# ---------------------------------------------------------------------------
# SHARED-PREFIX (dedup) variants: a second, batch-broadcast cache operand
#
# Serving's real chat workload shares the system+template header across
# every request.  The dedup engine (infer/serving.ContinuousBatcher
# prefix_dedup=True) stores that prefix's KV ONCE as (L, 1, Hkv, Pc, D)
# instead of replicating it into all max_slots pool slots — ~0.5 GB of
# HBM back at the 8B kv8 16-slot × 512-token flagship — and the kernels
# below read it as extra operands whose index_map is CONSTANT across the
# batch grid: Pallas fetches a block only when its index changes, so the
# prefix tiles stream from HBM ONCE PER LAYER instead of once per pool
# row (the replicated layout paid B× that in the per-step cache read).
#
# Numerics: the prefix logits get their own masked columns in the same
# fp32 softmax ([prefix ‖ pool-cache ‖ current-token] order — the same
# column order as a prefix physically seeded at the start of each slot's
# cache).  The per-row prefix mask (pmask) gates rows that must not see
# the prefix (full-prompt requests sharing a dedup pool).  The aliased
# slot/chunk writes are identical to the non-prefix kernels — the prefix
# operand is read-only.
# ---------------------------------------------------------------------------


def _kernel_write_p(idx_ref, q_ref, kn_ref, vn_ref, mask_ref, pmask_ref,
                    ck_ref, cv_ref, pk_ref, pv_ref,
                    o_ref, cko_ref, cvo_ref, *, rep: int):
    b = pl.program_id(0)
    Hkv, T, D = ck_ref.shape[2], ck_ref.shape[3], ck_ref.shape[4]
    ck = ck_ref[0, 0]                                   # (Hkv, T, D)
    cv = cv_ref[0, 0]
    pk = pk_ref[0, 0]                                   # (Hkv, Pc, D)
    pv = pv_ref[0, 0]
    q = q_ref[0]                                        # (Hkv, rep, D)
    kn = kn_ref[0]                                      # (Hkv, D)
    vn = vn_ref[0]
    logits = jax.lax.dot_general(
        q, ck, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, T)
    mask = mask_ref[b]                                  # (T,)
    logits = jnp.where(mask[None, None, :] > 0, logits, NEG)
    lp = jax.lax.dot_general(
        q, pk, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, Pc)
    pmask = pmask_ref[b]                                # (Pc,)
    lp = jnp.where(pmask[None, None, :] > 0, lp, NEG)
    ln = jnp.sum(q.astype(jnp.float32)
                 * kn.astype(jnp.float32)[:, None, :],
                 axis=-1)                               # (Hkv, rep)
    m = jnp.maximum(
        jnp.maximum(jnp.max(logits, axis=-1), jnp.max(lp, axis=-1)), ln)
    el = jnp.exp(logits - m[..., None])
    ep = jnp.exp(lp - m[..., None])
    en = jnp.exp(ln - m)
    denom = jnp.sum(el, axis=-1) + jnp.sum(ep, axis=-1) + en
    a = jax.lax.dot_general(
        el.astype(cv.dtype), cv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    a = a + jax.lax.dot_general(
        ep.astype(pv.dtype), pv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    a = a + en[..., None] * vn.astype(jnp.float32)[:, None, :]
    o_ref[0] = (a / denom[..., None]).astype(o_ref.dtype)

    # aliased slot write — identical to _kernel_write (16-row bf16 groups)
    slot = idx_ref[1 + b]
    tg = slot // 16
    r = slot - tg * 16
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hkv, 16, D), 1)
    old_k = ck_ref[0, 0, :, pl.ds(tg * 16, 16), :].astype(jnp.float32)
    old_v = cv_ref[0, 0, :, pl.ds(tg * 16, 16), :].astype(jnp.float32)
    cko_ref[0, 0] = jnp.where(
        rows == r, kn.astype(jnp.float32)[:, None, :], old_k
    ).astype(cko_ref.dtype)
    cvo_ref[0, 0] = jnp.where(
        rows == r, vn.astype(jnp.float32)[:, None, :], old_v
    ).astype(cvo_ref.dtype)


@functools.partial(jax.jit, donate_argnums=(1, 2),
                   static_argnames=("interpret",))
def decode_attention_stacked_write_prefix(
        qg, ck_all, cv_all, kv_mask, k_new, v_new, layer, slots,
        pk_all, pv_all, pmask, *, interpret: bool = False):
    """decode_attention_stacked_write + a batch-broadcast shared-prefix
    operand.  pk_all/pv_all: (L, 1, Hkv, Pc, D) read-only prefix KV
    (fetched once per call — its block index never changes across the
    grid); pmask: (B, Pc) 0/1 per-row prefix validity.  Everything else
    as decode_attention_stacked_write."""
    L, B, Hkv, T, D = ck_all.shape
    Pc = pk_all.shape[3]
    rep = qg.shape[2]
    slots = jnp.broadcast_to(
        jnp.asarray(slots, jnp.int32).reshape(-1), (B,))
    idx = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), slots])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((B, T), lambda b, idx: (0, 0)),
            pl.BlockSpec((B, Pc), lambda b, idx: (0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc, D),
                         lambda b, idx: (idx[0], 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc, D),
                         lambda b, idx: (idx[0], 0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, 16, D),
                         lambda b, idx: (idx[0], b, 0, idx[1 + b] // 16, 0)),
            pl.BlockSpec((1, 1, Hkv, 16, D),
                         lambda b, idx: (idx[0], b, 0, idx[1 + b] // 16, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_write_p, rep=rep),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep, D), qg.dtype),
            jax.ShapeDtypeStruct(ck_all.shape, ck_all.dtype),
            jax.ShapeDtypeStruct(cv_all.shape, cv_all.dtype),
        ],
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=interpret,
    )(idx, qg, k_new, v_new, kv_mask.astype(jnp.int32),
      pmask.astype(jnp.int32), ck_all, cv_all,
      pk_all.astype(ck_all.dtype), pv_all.astype(cv_all.dtype))


def supports_decode_attention_write_prefix(cfg, cache_shape,
                                           prefix_cols: int,
                                           cache_dtype=None) -> bool:
    """bf16 fused-write + prefix eligibility: prefix tiles are fetched
    once but budgeted double-buffered; Pc must be sublane-tileable."""
    L, B, Hkv, T, D = cache_shape
    itemsize = 2 if cache_dtype is None else jnp.dtype(cache_dtype).itemsize
    tile_bytes = 2 * Hkv * (T + 2 * prefix_cols) * D * itemsize
    return (D % 128 == 0 and T % 16 == 0 and prefix_cols % 16 == 0
            and prefix_cols > 0 and tile_bytes <= 24 * 1024 * 1024)


def _kernel_write_q_p(idx_ref, q_ref, knq_ref, vnq_ref, kns_ref, vns_ref,
                      mask_ref, pmask_ref, ck_ref, cv_ref, sk_ref, sv_ref,
                      pk_ref, pv_ref, psk_ref, psv_ref,
                      o_ref, cko_ref, cvo_ref, sko_ref, svo_ref, *,
                      rep: int):
    b = pl.program_id(0)
    Hkv, T, D = ck_ref.shape[2], ck_ref.shape[3], ck_ref.shape[4]
    ckf = ck_ref[0, 0].astype(jnp.bfloat16)             # (Hkv, T, D) exact
    cvf = cv_ref[0, 0].astype(jnp.bfloat16)
    sk = sk_ref[0, 0]                                   # (Hkv, T) f32
    sv = sv_ref[0, 0]
    pkf = pk_ref[0, 0].astype(jnp.bfloat16)             # (Hkv, Pc, D)
    pvf = pv_ref[0, 0].astype(jnp.bfloat16)
    psk = psk_ref[0, 0]                                 # (Hkv, Pc) f32
    psv = psv_ref[0, 0]
    q = q_ref[0]                                        # (Hkv, rep, D)
    knq = knq_ref[0]                                    # (Hkv, D) f32 ints
    vnq = vnq_ref[0]
    kns = kns_ref[b]                                    # (Hkv,) f32
    vns = vns_ref[b]
    logits = jax.lax.dot_general(
        q, ckf, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, T)
    logits = logits * sk[:, None, :]
    mask = mask_ref[b]                                  # (T,)
    logits = jnp.where(mask[None, None, :] > 0, logits, NEG)
    lp = jax.lax.dot_general(
        q, pkf, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, Pc)
    lp = lp * psk[:, None, :]
    pmask = pmask_ref[b]                                # (Pc,)
    lp = jnp.where(pmask[None, None, :] > 0, lp, NEG)
    knf = knq * kns[:, None]                            # dequant (Hkv, D)
    ln = jnp.sum(q.astype(jnp.float32) * knf[:, None, :], axis=-1)
    m = jnp.maximum(
        jnp.maximum(jnp.max(logits, axis=-1), jnp.max(lp, axis=-1)), ln)
    el = jnp.exp(logits - m[..., None])                 # (Hkv, rep, T)
    ep = jnp.exp(lp - m[..., None])                     # (Hkv, rep, Pc)
    en = jnp.exp(ln - m)
    denom = jnp.sum(el, axis=-1) + jnp.sum(ep, axis=-1) + en
    a = jax.lax.dot_general(
        (el * sv[:, None, :]).astype(jnp.bfloat16), cvf,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # (Hkv, rep, D)
    a = a + jax.lax.dot_general(
        (ep * psv[:, None, :]).astype(jnp.bfloat16), pvf,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    a = a + (en * vns[:, None])[..., None] * vnq[:, None, :]
    o_ref[0] = (a / denom[..., None]).astype(o_ref.dtype)

    # aliased quantized slot write — identical to _kernel_write_q
    slot = idx_ref[1 + b]
    tg = slot // 32
    r = slot - tg * 32
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hkv, 32, D), 1)
    old_k = ck_ref[0, 0, :, pl.ds(tg * 32, 32), :].astype(jnp.float32)
    old_v = cv_ref[0, 0, :, pl.ds(tg * 32, 32), :].astype(jnp.float32)
    cko_ref[0, 0] = jnp.where(rows == r, knq[:, None, :], old_k
                              ).astype(jnp.int8)
    cvo_ref[0, 0] = jnp.where(rows == r, vnq[:, None, :], old_v
                              ).astype(jnp.int8)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T), 1)
    sko_ref[0, 0] = jnp.where(cols == slot, kns[:, None], sk)
    svo_ref[0, 0] = jnp.where(cols == slot, vns[:, None], sv)


@functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4),
                   static_argnames=("interpret",))
def decode_attention_stacked_write_q_prefix(
        qg, ck_all, cv_all, sk_all, sv_all, kv_mask, k_new_q, v_new_q,
        k_new_s, v_new_s, layer, slots, pk_all, pv_all, psk_all, psv_all,
        pmask, *, interpret: bool = False):
    """decode_attention_stacked_write_q + a batch-broadcast shared-prefix
    operand.  pk_all/pv_all: (L, 1, Hkv, Pc, D) int8 with psk_all/psv_all
    (L, 1, Hkv, Pc) f32 scales, all read-only (fetched once per call);
    pmask: (B, Pc) 0/1 per-row prefix validity.  Everything else as
    decode_attention_stacked_write_q."""
    L, B, Hkv, T, D = ck_all.shape
    Pc = pk_all.shape[3]
    rep = qg.shape[2]
    slots = jnp.broadcast_to(
        jnp.asarray(slots, jnp.int32).reshape(-1), (B,))
    idx = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), slots])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((B, Hkv), lambda b, idx: (0, 0)),
            pl.BlockSpec((B, Hkv), lambda b, idx: (0, 0)),
            pl.BlockSpec((B, T), lambda b, idx: (0, 0)),
            pl.BlockSpec((B, Pc), lambda b, idx: (0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc, D),
                         lambda b, idx: (idx[0], 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc, D),
                         lambda b, idx: (idx[0], 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc),
                         lambda b, idx: (idx[0], 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc),
                         lambda b, idx: (idx[0], 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, rep, D), lambda b, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, 32, D),
                         lambda b, idx: (idx[0], b, 0, idx[1 + b] // 32, 0)),
            pl.BlockSpec((1, 1, Hkv, 32, D),
                         lambda b, idx: (idx[0], b, 0, idx[1 + b] // 32, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, idx: (idx[0], b, 0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_write_q_p, rep=rep),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep, D), qg.dtype),
            jax.ShapeDtypeStruct(ck_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(cv_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(sk_all.shape, jnp.float32),
            jax.ShapeDtypeStruct(sv_all.shape, jnp.float32),
        ],
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=interpret,
    )(idx, qg,
      k_new_q.astype(jnp.float32), v_new_q.astype(jnp.float32),
      k_new_s.astype(jnp.float32), v_new_s.astype(jnp.float32),
      kv_mask.astype(jnp.int32), pmask.astype(jnp.int32),
      ck_all, cv_all, sk_all, sv_all,
      pk_all.astype(jnp.int8), pv_all.astype(jnp.int8),
      psk_all.astype(jnp.float32), psv_all.astype(jnp.float32))


def supports_decode_attention_q_prefix(cfg, cache_shape,
                                       prefix_cols: int) -> bool:
    """int8 fused-write + prefix eligibility (VMEM: per-batch cache tile
    pair double-buffered + prefix pair, both with bf16 converts)."""
    L, B, Hkv, T, D = cache_shape
    tile_bytes = 2 * Hkv * (T + 2 * prefix_cols) * D * (1 + 2)
    return (D % 128 == 0 and T % 32 == 0 and prefix_cols % 32 == 0
            and prefix_cols > 0 and tile_bytes <= 20 * 1024 * 1024)


def _kernel_verify_qc_p(idx_ref, q_ref, knq_ref, vnq_ref, kns_ref, vns_ref,
                        mask_ref, pmask_ref, ck_ref, cv_ref, sk_ref, sv_ref,
                        pk_ref, pv_ref, psk_ref, psv_ref,
                        o_ref, cko_ref, cvo_ref, sko_ref, svo_ref,
                        g1k_ref, g1v_ref, *, rep: int, G: int, Hkv: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    T, D = ck_ref.shape[3], ck_ref.shape[4]
    GR = G * rep
    slot = idx_ref[1 + b]                               # chunk start column
    tg0 = slot // 32

    @pl.when(j == 1)
    def _():
        cko_ref[0, 0] = g1k_ref[...]
        cvo_ref[0, 0] = g1v_ref[...]

    @pl.when(j == 0)
    def _():
        mask = mask_ref[b]                              # (T,)
        pmask = pmask_ref[b]                            # (Pc,)
        cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        rowg = jax.lax.broadcasted_iota(jnp.int32, (GR, G), 0) // rep
        colg = jax.lax.broadcasted_iota(jnp.int32, (GR, G), 1)
        rows32 = jax.lax.broadcasted_iota(jnp.int32, (32, D), 0)

        for h in range(Hkv):                            # static head loop
            ckf = ck_ref[0, 0, h].astype(jnp.bfloat16)  # (T, D) exact
            cvf = cv_ref[0, 0, h].astype(jnp.bfloat16)
            sk = sk_ref[0, 0, pl.ds(h, 1), :]           # (1, T) f32
            sv = sv_ref[0, 0, pl.ds(h, 1), :]
            pkf = pk_ref[0, 0, h].astype(jnp.bfloat16)  # (Pc, D) exact
            pvf = pv_ref[0, 0, h].astype(jnp.bfloat16)
            psk = psk_ref[0, 0, pl.ds(h, 1), :]         # (1, Pc) f32
            psv = psv_ref[0, 0, pl.ds(h, 1), :]
            knq = knq_ref[0, h]                         # (G, D) f32 ints
            vnq = vnq_ref[0, h]
            kns = kns_ref[b, pl.ds(h, 1), :]            # (1, G) f32
            vns = vns_ref[b, pl.ds(h, 1), :]

            q = q_ref[0, h]                             # (G·rep, D) bf16
            logits = jax.lax.dot_general(
                q, ckf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (GR, T)
            logits = logits * sk
            logits = jnp.where(mask[None, :] > 0, logits, NEG)
            lp = jax.lax.dot_general(
                q, pkf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (GR, Pc)
            lp = lp * psk
            lp = jnp.where(pmask[None, :] > 0, lp, NEG)
            ln = jax.lax.dot_general(
                q.astype(jnp.float32), knq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * kns   # (GR, G)
            ln = jnp.where(colg <= rowg, ln, NEG)       # intra-chunk causal
            m = jnp.maximum(
                jnp.maximum(jnp.max(logits, axis=-1), jnp.max(lp, axis=-1)),
                jnp.max(ln, axis=-1))
            el = jnp.exp(logits - m[:, None])           # (GR, T)
            ep = jnp.exp(lp - m[:, None])               # (GR, Pc)
            en = jnp.exp(ln - m[:, None])               # (GR, G)
            denom = (jnp.sum(el, axis=-1) + jnp.sum(ep, axis=-1)
                     + jnp.sum(en, axis=-1))
            a = jax.lax.dot_general(
                (el * sv).astype(jnp.bfloat16), cvf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (GR, D)
            a = a + jax.lax.dot_general(
                (ep * psv).astype(jnp.bfloat16), pvf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = a + jax.lax.dot_general(
                en * vns, vnq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, h] = (a / denom[:, None]).astype(o_ref.dtype)

            snewk = sk
            snewv = sv
            for g in range(G):
                snewk = jnp.where(cols1 == slot + g, kns[0, g], snewk)
                snewv = jnp.where(cols1 == slot + g, vns[0, g], snewv)
            sko_ref[0, 0, pl.ds(h, 1), :] = snewk
            svo_ref[0, 0, pl.ds(h, 1), :] = snewv

            for jj in range(2):
                tg = tg0 + jj
                r = slot - tg * 32
                old_k = ck_ref[0, 0, h, pl.ds(tg * 32, 32), :].astype(
                    jnp.float32)                                 # (32, D)
                old_v = cv_ref[0, 0, h, pl.ds(tg * 32, 32), :].astype(
                    jnp.float32)
                new_k = old_k
                new_v = old_v
                for g in range(G):
                    new_k = jnp.where(rows32 == r + g, knq[g][None, :],
                                      new_k)
                    new_v = jnp.where(rows32 == r + g, vnq[g][None, :],
                                      new_v)
                if jj == 0:
                    cko_ref[0, 0, h] = new_k.astype(jnp.int8)
                    cvo_ref[0, 0, h] = new_v.astype(jnp.int8)
                else:
                    g1k_ref[h] = new_k.astype(jnp.int8)
                    g1v_ref[h] = new_v.astype(jnp.int8)


@functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4),
                   static_argnames=("interpret",))
def decode_attention_stacked_verify_qc_prefix(
        qg, ck_all, cv_all, sk_all, sv_all, kv_mask, k_new_q, v_new_q,
        k_new_s, v_new_s, layer, slots, pk_all, pv_all, psk_all, psv_all,
        pmask, *, interpret: bool = False):
    """decode_attention_stacked_verify_qc + a batch-broadcast shared-prefix
    operand (read-only, fetched once per call — constant block index).
    pk_all/pv_all: (L, 1, Hkv, Pc, D) int8; psk_all/psv_all:
    (L, 1, Hkv, Pc) f32; pmask: (B, Pc) 0/1 per-row prefix validity."""
    L, B, Hkv, T, D = ck_all.shape
    Pc = pk_all.shape[3]
    G = k_new_q.shape[2]
    GR = qg.shape[2]
    rep = GR // G
    slots = jnp.broadcast_to(
        jnp.asarray(slots, jnp.int32).reshape(-1), (B,))
    idx = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), slots])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, 2),
        in_specs=[
            pl.BlockSpec((1, Hkv, GR, D), lambda b, j, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, G, D), lambda b, j, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, G, D), lambda b, j, idx: (b, 0, 0, 0)),
            pl.BlockSpec((B, Hkv, G), lambda b, j, idx: (0, 0, 0)),
            pl.BlockSpec((B, Hkv, G), lambda b, j, idx: (0, 0, 0)),
            pl.BlockSpec((B, T), lambda b, j, idx: (0, 0)),
            pl.BlockSpec((B, Pc), lambda b, j, idx: (0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, j, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T, D),
                         lambda b, j, idx: (idx[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, j, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, j, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc, D),
                         lambda b, j, idx: (idx[0], 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc, D),
                         lambda b, j, idx: (idx[0], 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc),
                         lambda b, j, idx: (idx[0], 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, Pc),
                         lambda b, j, idx: (idx[0], 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, GR, D), lambda b, j, idx: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, 32, D),
                         lambda b, j, idx: (idx[0], b, 0,
                                            idx[1 + b] // 32 + j, 0)),
            pl.BlockSpec((1, 1, Hkv, 32, D),
                         lambda b, j, idx: (idx[0], b, 0,
                                            idx[1 + b] // 32 + j, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, j, idx: (idx[0], b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, T),
                         lambda b, j, idx: (idx[0], b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hkv, 32, D), jnp.int8),
            pltpu.VMEM((Hkv, 32, D), jnp.int8),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_verify_qc_p, rep=rep, G=G, Hkv=Hkv),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, GR, D), qg.dtype),
            jax.ShapeDtypeStruct(ck_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(cv_all.shape, jnp.int8),
            jax.ShapeDtypeStruct(sk_all.shape, jnp.float32),
            jax.ShapeDtypeStruct(sv_all.shape, jnp.float32),
        ],
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True),
        interpret=interpret,
    )(idx, qg,
      k_new_q.astype(jnp.float32), v_new_q.astype(jnp.float32),
      k_new_s.astype(jnp.float32), v_new_s.astype(jnp.float32),
      kv_mask.astype(jnp.int32), pmask.astype(jnp.int32),
      ck_all, cv_all, sk_all, sv_all,
      pk_all.astype(jnp.int8), pv_all.astype(jnp.int8),
      psk_all.astype(jnp.float32), psv_all.astype(jnp.float32))


def supports_verify_chunk_prefix(cfg, cache_shape, G: int,
                                 prefix_cols: int) -> bool:
    """Chunk-verify + prefix eligibility: the non-prefix budget plus the
    double-buffered prefix int8 pair, one head's bf16 prefix converts, and
    the (GR, Pc) fp32 logit temps."""
    L, B, Hkv, T, D = cache_shape
    GR = G * (cfg.num_heads // cfg.num_kv_heads)
    tile_bytes = (2 * 2 * Hkv * T * D              # int8 pair, dbuffered
                  + 2 * T * D * 2                  # one head's bf16 pair
                  + 3 * GR * T * 4                 # logits/el/el·sv (f32)
                  + 4 * 32 * D * 4                 # stale tile groups
                  + 8 * T * 4                      # scale rows
                  + 2 * 2 * Hkv * prefix_cols * D  # prefix int8 pair, dbuf
                  + 2 * prefix_cols * D * 2        # one head's bf16 pair
                  + 3 * GR * prefix_cols * 4       # prefix logit temps
                  + 8 * prefix_cols * 4)
    return (D % 128 == 0 and T % 32 == 0 and T >= 64 and G <= 32
            and prefix_cols % 32 == 0 and prefix_cols > 0
            and tile_bytes <= 14 * 1024 * 1024)
