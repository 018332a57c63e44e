"""Pallas TPU flash attention, forward + custom-VJP backward.

Replaces the cuDNN/SDPA attention the reference consumes through HF modules
(SURVEY.md §2.5 row 1) with online-softmax tiled kernels:

  forward: grid (B*H, Sq/BQ, Skv/BK) — the kv axis iterates sequentially per
  TPU grid semantics, carrying (m, l, acc) in VMEM scratch; logits/softmax in
  fp32 on the MXU/VPU; the (BQ, BK) bias tile injects padding+causal masking,
  so ONE kernel serves the ESM2/ESMC encoders (bidirectional) and the
  Llama/Qwen3 prefill (causal) alike.  Saves the logsumexp for the backward.

  backward: two kernels re-materializing P = exp(qkᵀ + bias − lse) per tile
  (flash-attention-2 style):
    * dQ kernel, grid (B*H, nq, nk): dq += (P ∘ (dO·Vᵀ − D))·K
    * dK/dV kernel, grid (B*H, nk, nq): dv += Pᵀ·dO ; dk += (P∘(dPᵀ−D))ᵀ·Q
  with D = rowsum(dO ∘ O) precomputed outside.

O(Sq·D) memory instead of materializing (Sq, Skv) attention weights in HBM —
the memory-bandwidth rule of the Pallas guide.

Numerics: on real TPUs the in-kernel dots multiply at MXU-native (bf16)
precision with fp32 accumulation — measured to match XLA's default-precision
attention to ~1e-2 absolute on fp32 inputs (interpret mode matches exactly);
bf16 training/inference sees identical behavior either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, n_kv_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # (BQ, D)
    k = k_ref[0]                       # (BK, D)
    v = v_ref[0]                       # (BK, D)
    bias = bias_ref[0].astype(jnp.float32)   # (BQ, BK)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        l = l_scr[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)   # fully-masked padding rows
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(safe_l)


def _pad_inputs(q, k, v, bias, BQ, BK):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    per_head = bias.shape[1] != 1
    bias = jnp.broadcast_to(bias, (B, H if per_head else 1, Sq, Skv))
    Sq_p = _round_up(Sq, BQ)
    Skv_p = _round_up(Skv, BK)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))
    biasp = jnp.pad(
        bias.astype(jnp.float32),
        ((0, 0), (0, 0), (0, Sq_p - Sq), (0, Skv_p - Skv)),
        constant_values=NEG_INF)
    qf = qp.reshape(B * H, Sq_p, D)
    kf = kp.reshape(B * H, Skv_p, D)
    vf = vp.reshape(B * H, Skv_p, D)
    if per_head:
        biasf = biasp.reshape(B * H, Sq_p, Skv_p)
        bias_index = lambda bh, i, j: (bh, i, j)
    else:
        biasf = biasp.reshape(B, Sq_p, Skv_p)
        bias_index = lambda bh, i, j, H=H: (bh // H, i, j)
    return qf, kf, vf, biasf, bias_index, Sq_p, Skv_p, per_head


def _flash_fwd(q, k, v, bias, block_q, block_k, interpret):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    BQ = min(block_q, _round_up(Sq, 8))
    BK = min(block_k, _round_up(Skv, 8))
    qf, kf, vf, biasf, bias_index, Sq_p, Skv_p, _ = _pad_inputs(
        q, k, v, bias, BQ, BK)
    n_q, n_kv = Sq_p // BQ, Skv_p // BK

    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, n_kv_blocks=n_kv),
        grid=(B * H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, BK), bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Sq_p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, biasf)
    out = o.reshape(B, H, Sq_p, D)[:, :, :Sq]
    return out, lse


# ---------------------------------------------------------------------------
# bias-free masked forward: masks computed in-kernel from per-row lengths —
# nothing of size (B, Sq, Skv) ever touches HBM (the bias-tensor variant
# measured SLOWER than XLA fused attention at S=512 because of exactly that
# materialization)


def _fwd_masked_kernel(kv_start_ref, kv_len_ref, q_ref, k_ref, v_ref,
                       o_ref, lse_ref, m_scr, l_scr, acc_scr,
                       *, n_kv_blocks: int, block_q: int, block_k: int,
                       causal: bool, n_heads: int):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    b = bh // n_heads

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (BQ, BK)

    start = kv_start_ref[b]
    length = kv_len_ref[b]
    cols = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    ok = jnp.logical_and(cols >= start, cols < start + length)
    if causal:
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        ok = jnp.logical_and(ok, cols <= rows)
    logits = jnp.where(ok, logits, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    # mask p EXPLICITLY: rows with zero valid keys have m_new == NEG_INF and
    # exp(logits - m_new) == 1 at every (invalid) position — relying on exp
    # underflow alone makes empty rows attend uniformly to everything (and
    # corrupts lse for the backward: NEG_INF + log(l) absorbs the log term
    # in fp32, so bwd p becomes 1 across the whole row and sprays cotangent
    # into every key slot, compounding ~x512 per layer through the scan).
    # Empty rows now output exactly 0 (vs XLA's uniform-average garbage —
    # both are don't-care values, but 0 keeps gradients exactly zero).
    p = jnp.where(ok, jnp.exp(logits - m_new), 0.0)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        l = l_scr[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(safe_l)


def _flash_masked_fwd_impl(q, k, v, kv_start, kv_len, causal,
                           block_q, block_k, interpret):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    BQ = min(block_q, _round_up(Sq, 8))
    BK = min(block_k, _round_up(Skv, 8))
    Sq_p = _round_up(Sq, BQ)
    Skv_p = _round_up(Skv, BK)
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))).reshape(
        B * H, Sq_p, D)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0))).reshape(
        B * H, Skv_p, D)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0))).reshape(
        B * H, Skv_p, D)
    n_q, n_kv = Sq_p // BQ, Skv_p // BK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i, j, *_: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, i, j, *_: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, i, j, *_: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i, j, *_: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda bh, i, j, *_: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
    )
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_masked_kernel, n_kv_blocks=n_kv, block_q=BQ, block_k=BK,
            causal=causal, n_heads=H),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Sq_p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(kv_start, jnp.int32), jnp.asarray(kv_len, jnp.int32),
      qf, kf, vf)
    return o.reshape(B, H, Sq_p, D)[:, :, :Sq], lse


# ---------------------------------------------------------------------------
# backward


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_scr, *, n_kv_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)           # (BQ, D)
    lse = lse_ref[0]                             # (BQ, 1)
    delta = delta_ref[0]                         # (BQ, 1)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias
    p = jnp.exp(logits - lse)                    # (BQ, BK)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (BQ, BK)
    ds = p * (dp - delta)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, n_q_blocks: int):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias
    p = jnp.exp(logits - lse)                    # (BQ, BK)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (BK, D)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (BK, D)

    @pl.when(qi == n_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(block_q, block_k, interpret, res, g):
    q, k, v, bias, o, lse = res
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    BQ = min(block_q, _round_up(Sq, 8))
    BK = min(block_k, _round_up(Skv, 8))
    qf, kf, vf, biasf, bias_index, Sq_p, Skv_p, _ = _pad_inputs(
        q, k, v, bias, BQ, BK)
    n_q, n_kv = Sq_p // BQ, Skv_p // BK

    gof = jnp.pad(g, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))).reshape(
        B * H, Sq_p, D)
    of = jnp.pad(o, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))).reshape(
        B * H, Sq_p, D)
    # delta = rowsum(dO ∘ O); lse already padded width (B*H, Sq_p)
    delta = jnp.sum(gof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)
    # padded rows: lse=log(1)=0 from the masked forward; p=exp(-inf-0)=0 ok

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, n_kv_blocks=n_kv),
        grid=(B * H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, BK), bias_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, D), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda bh, i, j: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, biasf, gof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, n_q_blocks=n_q),
        grid=(B * H, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, j, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, BK),
                         lambda bh, j, i, f=bias_index: f(bh, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, D), lambda bh, j, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda bh, j, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda bh, j, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BK, D), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Skv_p, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Skv_p, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((BK, D), jnp.float32),
            pltpu.VMEM((BK, D), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, biasf, gof, lse, delta)

    dq = dq.reshape(B, H, Sq_p, D)[:, :, :Sq]
    dk = dk.reshape(B, H, Skv_p, D)[:, :, :Skv]
    dv = dv.reshape(B, H, Skv_p, D)[:, :, :Skv]
    return dq, dk, dv, None


# ---------------------------------------------------------------------------
# public entry


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention(q, k, v, bias, block_q, block_k, interpret):
    out, _ = _flash_fwd(q, k, v, bias, block_q, block_k, interpret)
    return out


def _flash_attention_fwd(q, k, v, bias, block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, bias, block_q, block_k, interpret)
    return out, (q, k, v, bias, out, lse)


def _flash_attention_bwd(block_q, block_k, interpret, res, g):
    return _flash_bwd(block_q, block_k, interpret, res, g)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention_tpu(q, k, v, bias, *, block_q: int = 128,
                        block_k: int = 128, interpret: bool = False):
    """q: (B, H, Sq, D); k/v: (B, H, Skv, D); bias: fp32 additive, shape
    (B, 1|H, Sq|1, Skv).  Caller pre-scales q.  Differentiable (custom VJP
    with Pallas backward kernels); bias gradients are not propagated."""
    return _flash_attention(q, k, v, bias, block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# masked backward (mirrors the bias-variant backward with in-kernel masks)


def _bwd_masked_dq_kernel(kv_start_ref, kv_len_ref, q_ref, k_ref, v_ref,
                          do_ref, lse_ref, delta_ref, dq_ref, acc_scr,
                          *, n_kv_blocks: int, block_q: int, block_k: int,
                          causal: bool, n_heads: int):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    b = bh // n_heads

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    start = kv_start_ref[b]
    length = kv_len_ref[b]
    cols = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    ok = jnp.logical_and(cols >= start, cols < start + length)
    if causal:
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        ok = jnp.logical_and(ok, cols <= rows)
    logits = jnp.where(ok, logits, NEG_INF)

    # explicit mask (not exp underflow): empty rows carry a degenerate lse
    # (see _fwd_masked_kernel) and would otherwise get p == 1 everywhere
    p = jnp.where(ok, jnp.exp(logits - lse), 0.0)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_masked_dkv_kernel(kv_start_ref, kv_len_ref, q_ref, k_ref, v_ref,
                           do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                           dk_scr, dv_scr,
                           *, n_q_blocks: int, block_q: int, block_k: int,
                           causal: bool, n_heads: int):
    bh = pl.program_id(0)
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    b = bh // n_heads

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    start = kv_start_ref[b]
    length = kv_len_ref[b]
    cols = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    ok = jnp.logical_and(cols >= start, cols < start + length)
    if causal:
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        ok = jnp.logical_and(ok, cols <= rows)
    logits = jnp.where(ok, logits, NEG_INF)

    # explicit mask — see _bwd_masked_dq_kernel
    p = jnp.where(ok, jnp.exp(logits - lse), 0.0)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qi == n_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_masked_bwd_impl(q, k, v, kv_start, kv_len, o, lse, g,
                           causal, block_q, block_k, interpret):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    BQ = min(block_q, _round_up(Sq, 8))
    BK = min(block_k, _round_up(Skv, 8))
    Sq_p = _round_up(Sq, BQ)
    Skv_p = _round_up(Skv, BK)
    qf = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))).reshape(
        B * H, Sq_p, D)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0))).reshape(
        B * H, Skv_p, D)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0))).reshape(
        B * H, Skv_p, D)
    gof = jnp.pad(g, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))).reshape(
        B * H, Sq_p, D)
    of = jnp.pad(o, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))).reshape(
        B * H, Sq_p, D)
    delta = jnp.sum(gof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)
    n_q, n_kv = Sq_p // BQ, Skv_p // BK
    starts = jnp.asarray(kv_start, jnp.int32)
    lens = jnp.asarray(kv_len, jnp.int32)

    row_spec = lambda BQ_: pl.BlockSpec(
        (1, BQ_, 1), lambda bh, i, j, *_: (bh, i, 0),
        memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_masked_dq_kernel, n_kv_blocks=n_kv, block_q=BQ, block_k=BK,
            causal=causal, n_heads=H),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B * H, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda bh, i, j, *_: (bh, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, D), lambda bh, i, j, *_: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, D), lambda bh, i, j, *_: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BQ, D), lambda bh, i, j, *_: (bh, i, 0),
                             memory_space=pltpu.VMEM),
                row_spec(BQ), row_spec(BQ),
            ],
            out_specs=pl.BlockSpec(
                (1, BQ, D), lambda bh, i, j, *_: (bh, i, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, D), q.dtype),
        interpret=interpret,
    )(starts, lens, qf, kf, vf, gof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_masked_dkv_kernel, n_q_blocks=n_q, block_q=BQ, block_k=BK,
            causal=causal, n_heads=H),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B * H, n_kv, n_q),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda bh, j, i, *_: (bh, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, D), lambda bh, j, i, *_: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, D), lambda bh, j, i, *_: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BQ, D), lambda bh, j, i, *_: (bh, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BQ, 1), lambda bh, j, i, *_: (bh, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BQ, 1), lambda bh, j, i, *_: (bh, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, BK, D), lambda bh, j, i, *_: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, D), lambda bh, j, i, *_: (bh, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((BK, D), jnp.float32),
                            pltpu.VMEM((BK, D), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B * H, Skv_p, D), k.dtype),
                   jax.ShapeDtypeStruct((B * H, Skv_p, D), v.dtype)],
        interpret=interpret,
    )(starts, lens, qf, kf, vf, gof, lse, delta)

    dq = dq.reshape(B, H, Sq_p, D)[:, :, :Sq]
    dk = dk.reshape(B, H, Skv_p, D)[:, :, :Skv]
    dv = dv.reshape(B, H, Skv_p, D)[:, :, :Skv]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_masked(q, k, v, kv_start, kv_len, causal, block_q, block_k,
                  interpret):
    out, _ = _flash_masked_fwd_impl(q, k, v, kv_start, kv_len, causal,
                                    block_q, block_k, interpret)
    return out


def _flash_masked_fwd(q, k, v, kv_start, kv_len, causal, block_q, block_k,
                      interpret):
    out, lse = _flash_masked_fwd_impl(q, k, v, kv_start, kv_len, causal,
                                      block_q, block_k, interpret)
    return out, (q, k, v, kv_start, kv_len, out, lse)


def _flash_masked_bwd(causal, block_q, block_k, interpret, res, g):
    q, k, v, kv_start, kv_len, o, lse = res
    dq, dk, dv = _flash_masked_bwd_impl(
        q, k, v, kv_start, kv_len, o, lse, g, causal, block_q, block_k,
        interpret)
    return dq, dk, dv, None, None


_flash_masked.defvjp(_flash_masked_fwd, _flash_masked_bwd)


def flash_attention_masked(q, k, v, kv_start, kv_len, *, causal: bool = False,
                           block_q: int = 256, block_k: int = 256,
                           interpret: bool = False):
    """Bias-free flash attention (differentiable, custom VJP).  Valid keys
    per row b are [kv_start[b], kv_start[b]+kv_len[b]); `causal` additionally
    enforces col ≤ row on SEQUENCE indices — the self-attention layout of the
    encoder and prefill paths.  q/k/v: (B, H, S*, D); kv_start/kv_len: (B,)
    int32.  No (B, Sq, Skv)-sized tensor ever reaches HBM."""
    return _flash_masked(q, k, v, kv_start, kv_len, causal, block_q, block_k,
                         interpret)
