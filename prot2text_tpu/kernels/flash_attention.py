"""Pallas TPU flash attention (bidirectional or masked-causal via bias).

Replaces the cuDNN/SDPA attention the reference consumes through HF modules
(SURVEY.md §2.5 row 1) with an online-softmax tiled kernel:

  grid = (B*H, Sq/BQ, Skv/BK) — the last axis iterates sequentially per TPU
  grid semantics, carrying (m, l, acc) in VMEM scratch; logits/softmax in
  fp32 on the MXU/VPU; the (BQ, BK) bias tile injects padding+causal masking,
  so ONE kernel serves the ESM2/ESMC encoders (bidirectional) and the
  Llama/Qwen3 prefill (causal) alike.

O(Sq·D) memory instead of materializing (Sq, Skv) attention, and no HBM
round-trip for the weights — the HBM-bandwidth rule of the Pallas guide.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
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
        preferred_element_type=jnp.float32)  # (BQ, BK)
    logits = logits + bias

    m_prev = m_scr[:]                  # (BQ, 1)
    l_prev = l_scr[:]
    m_cur = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)        # (BQ, BK)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BQ, D)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(ki == n_kv_blocks - 1)
    def _finalize():
        l = l_scr[:]
        # fully-masked rows (padding queries) have l == 0; emit zeros
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention_tpu(q, k, v, bias, *, block_q: int = 128,
                        block_k: int = 128, interpret: bool = False):
    """q: (B, H, Sq, D); k/v: (B, H, Skv, D); bias: fp32 additive, shape
    (B, 1, Sq, Skv) or (B, H, Sq, Skv).  Returns (B, H, Sq, D) in q.dtype.
    Caller pre-scales q (matching this repo's attention convention)."""
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    per_head_bias = bias.shape[1] != 1
    # bias may broadcast over Sq (e.g. pure key-padding masks (B,1,1,Skv))
    bias = jnp.broadcast_to(
        bias, (B, H if per_head_bias else 1, Sq, Skv))

    BQ = min(block_q, _round_up(Sq, 8))
    BK = min(block_k, _round_up(Skv, 8))
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
    if per_head_bias:
        biasf = biasp.reshape(B * H, Sq_p, Skv_p)
        bias_index = lambda bh, qi, ki: (bh, qi, ki)
    else:
        biasf = biasp.reshape(B, Sq_p, Skv_p)
        bias_index = lambda bh, qi, ki: (bh // H, qi, ki)

    n_q = Sq_p // BQ
    n_kv = Skv_p // BK

    out = pl.pallas_call(
        functools.partial(_flash_kernel, n_kv_blocks=n_kv),
        grid=(B * H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, BK), bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq_p, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, D), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, biasf)

    return out.reshape(B, H, Sq_p, D)[:, :, :Sq]
