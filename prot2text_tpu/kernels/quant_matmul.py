"""Streaming weight-quantized matmul kernels (Pallas TPU).

Decode-time linear layers are weight-streaming-bound: y = x·W with a few
activation rows (B≈8-64) against hundreds of MB of weights that are read
exactly once per step.  Measured on v5e (scripts/bench_quant_matmul.py),
XLA's mixed-dtype `dot_general` moves int8 weights at ~410 GB/s and bf16 at
~520 GB/s — far from the 819 GB/s HBM peak — and an XLA-level int4 unpack
(shift + two dots) does NOT fuse: it materializes unpacked int8 to HBM and
ends up slower than int8.  These kernels recover the headroom:

* `quant_matmul_int8`  — x (R, K) bf16 · W (K, N) int8 · scale (N,) f32.
  Classic (n, k)-grid accumulation matmul; Pallas grid pipelining
  double-buffers the weight-tile DMA behind the MXU dot.
* `quant_matmul_int4`  — W packed two-nibbles-per-byte in SPLIT-HALF order:
  byte[k, n] = (q[k, n] & 0xF) | (q[k + K/2, n] << 4), i.e. the low nibbles
  hold rows [0, K/2) and the high nibbles rows [K/2, K).  The kernel unpacks
  with two arithmetic shifts (NO sublane interleave — the two halves hit
  different x slices) and issues two MXU dots per tile.  Half the HBM bytes
  of int8.

The reference reaches the same capability through bitsandbytes' CUDA kernels
(scripts/utils_argparse.py:27-48 `--torch_dtype int8/int4`); here the packing
is explicit and the kernel is Mosaic.  Numerics: weights dequantize EXACTLY
(int4/int8 values are small integers, bf16 holds them exactly); products
accumulate in fp32 on the MXU; the per-output-channel scale applies in the
fp32 epilogue — bit-identical to the XLA mixed-dtype reference path.
(Exception: the opt-in int4 'pairs' format trades ~4e-6-of-max epilogue
error for speed — see the bf16-pair section below.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(dim: int, candidates) -> int | None:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def _pad_rows(x, mult: int = 16):
    R = x.shape[0]
    pad = (-R) % mult
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, R


# ---------------------------------------------------------------------------
# int8


def _mm_i8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def supports_quant_matmul(K: int, N: int, bits: int = 8) -> bool:
    Keff = K // 2 if bits == 4 else K
    return (_pick_block(N, (1024, 512, 256, 128)) is not None
            and _pick_block(Keff, (1024, 512, 256, 128, 64, 32))
            is not None)


def supports_quant_matmul_planes(K: int, N: int) -> bool:
    return (K % 8 == 0
            and _pick_block(N, (1024, 512, 256, 128)) is not None
            and _pick_block(K // 8, (256, 128, 64, 32, 16, 8)) is not None)


# the bf16-pair format tiles identically (K/8 words per column)
supports_quant_matmul_pairs = supports_quant_matmul_planes


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                              "block_k", "block_n"))
def quant_matmul_int8(x, w_q, scale, *, out_dtype=jnp.bfloat16,
                      interpret: bool = False, block_k: int = 0,
                      block_n: int = 0):
    """x: (R, K) bf16; w_q: (K, N) int8; scale: (1, N) or (N,) f32.
    Returns (R, N) out_dtype = (x · w_q) * scale with fp32 accumulation."""
    K, N = w_q.shape
    x, R = _pad_rows(x.astype(jnp.bfloat16))
    Rp = x.shape[0]
    bn = block_n or _pick_block(N, (1024, 512, 256, 128))
    bk = block_k or _pick_block(K, (1024, 512, 256, 128, 64, 32))
    nk = K // bk
    scale = scale.reshape(1, N)
    out = pl.pallas_call(
        functools.partial(_mm_i8_kernel, nk=nk),
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w_q, scale)
    return out[:R]


# ---------------------------------------------------------------------------
# int4 (split-half nibble packing)


def pack_int4(q):
    """q: (..., K, N) int values in [-8, 7] (any int dtype) → (..., K/2, N)
    int8 with byte[..., k, :] = (q[..., k, :] & 0xF) | (q[..., k+K/2, :] << 4).
    Split-half order: NO interleave to undo at matmul time."""
    K = q.shape[-2]
    assert K % 2 == 0, "pack_int4 needs an even contraction dim"
    q = jnp.asarray(q, jnp.int8)
    lo = q[..., : K // 2, :]
    hi = q[..., K // 2:, :]
    return ((lo & jnp.int8(0xF))
            | jax.lax.shift_left(hi, jnp.int8(4))).astype(jnp.int8)


def unpack_int4(packed):
    """Inverse of pack_int4: (..., K/2, N) int8 → (..., K, N) int8 in [-8, 7]."""
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(packed, jnp.int8(4)), jnp.int8(4))
    hi = jax.lax.shift_right_arithmetic(packed, jnp.int8(4))
    return jnp.concatenate([lo, hi], axis=-2)


def _mm_i4_kernel(x1_ref, x2_ref, wp_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic has no int8 vector shifts (arith.shli fails to legalize on
    # vector<...xi8>) — widen to i32, shift there, convert straight to bf16.
    wp = wp_ref[:].astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(wp, 28), 28).astype(jnp.bfloat16)
    hi = jax.lax.shift_right_arithmetic(wp, 4).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x1_ref[:], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x2_ref[:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                              "block_k", "block_n"))
def quant_matmul_int4(x, w_packed, scale, *, out_dtype=jnp.bfloat16,
                      interpret: bool = False, block_k: int = 0,
                      block_n: int = 0):
    """x: (R, K) bf16; w_packed: (K/2, N) int8 split-half nibbles (pack_int4);
    scale: (1, N) or (N,) f32.  Returns (R, N) = (x · unpack(w_packed)) * scale."""
    K2, N = w_packed.shape
    x, R = _pad_rows(x.astype(jnp.bfloat16))
    Rp = x.shape[0]
    x1, x2 = x[:, :K2], x[:, K2:]
    bn = block_n or _pick_block(N, (1024, 512, 256, 128))
    bk = block_k or _pick_block(K2, (1024, 512, 256, 128, 64, 32))
    nk = K2 // bk
    scale = scale.reshape(1, N)
    out = pl.pallas_call(
        functools.partial(_mm_i4_kernel, nk=nk),
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((Rp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x1, x2, w_packed, scale)
    return out[:R]


# ---------------------------------------------------------------------------
# stacked (layer-indexed) variants — scalar-prefetch layer selection
#
# Inside a `lax.scan` over layers, passing per-layer weight slices as scan
# xs forces XLA to MATERIALIZE a copy of each slice before the pallas call
# (a pallas operand must be a real buffer; only XLA ops like dot_general can
# fuse the slice into their operand read).  At Qwen3-14B that copy is ~7 GB
# of extra read+write per decode step — measured ~55 GB/s effective kernel
# bandwidth vs ~170+ GB/s without the copy (scripts/bench_launch_overhead.py,
# bench_stacked_matmul.py).  These variants instead take the FULL stacked
# (L, K, N) buffer plus a dynamic layer index: the index rides scalar
# prefetch and the BlockSpec index_map reads the layer's tiles STRAIGHT from
# the stacked buffer — zero copies, scan-invariant operand.


def _mm_i4_stacked_kernel(idx_ref, x1_ref, x2_ref, wp_ref, s_ref, o_ref,
                          acc_ref, *, nk: int):
    del idx_ref  # consumed by the index_maps
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wp = wp_ref[0].astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(wp, 28), 28).astype(jnp.bfloat16)
    hi = jax.lax.shift_right_arithmetic(wp, 4).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x1_ref[:], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x2_ref[:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                              "block_k", "block_n"))
def quant_matmul_int4_stacked(x, w_packed_all, scale_all, layer, *,
                              out_dtype=jnp.bfloat16,
                              interpret: bool = False, block_k: int = 0,
                              block_n: int = 0):
    """x: (R, K) bf16; w_packed_all: (L, K/2, N) int8 split-half nibbles;
    scale_all: (L, 1, N) f32; layer: scalar int32.  Returns
    (R, N) = (x · unpack(w_packed_all[layer])) * scale_all[layer] without
    materializing the layer slice."""
    L, K2, N = w_packed_all.shape
    x, R = _pad_rows(x.astype(jnp.bfloat16))
    Rp = x.shape[0]
    x1, x2 = x[:, :K2], x[:, K2:]
    bn = block_n or _pick_block(N, (1024, 512, 256, 128))
    bk = block_k or _pick_block(K2, (1024, 512, 256, 128, 64, 32))
    nk = K2 // bk
    scale_all = scale_all.reshape(L, 1, N)
    idx = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda n, k, idx: (0, k)),
            pl.BlockSpec((Rp, bk), lambda n, k, idx: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda n, k, idx: (idx[0], k, n)),
            pl.BlockSpec((1, 1, bn), lambda n, k, idx: (idx[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k, idx: (0, n)),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mm_i4_stacked_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(idx, x1, x2, w_packed_all, scale_all)
    return out[:R]


def pack_int4_planes(q):
    """q: (..., K, N) ints in [-8, 7] → (..., K/8, N) int32 'nibble-plane'
    words: nibble j of word [k8, n] holds q[k8 + j*K/8, n].  The kernel
    loads NATIVE i32 tiles — no i8→i32 widening (Mosaic legalizes only i32
    vector shifts) — and unpacks 8 values per word with 16 shifts + 8
    converts (probe: scripts/bench_int4_planes.py)."""
    K = q.shape[-2]
    assert K % 8 == 0, "pack_int4_planes needs K % 8 == 0"
    qs = jnp.asarray(q, jnp.int32) & 0xF
    out = jnp.zeros(q.shape[:-2] + (K // 8, q.shape[-1]), jnp.int32)
    for j in range(8):
        plane = qs[..., j * (K // 8):(j + 1) * (K // 8), :]
        out = out | jax.lax.shift_left(plane, 4 * j)
    return out


def unpack_int4_planes(packed):
    """Inverse of pack_int4_planes: (..., K/8, N) i32 → (..., K, N) int8."""
    outs = []
    for j in range(8):
        v = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(packed, 28 - 4 * j), 28)
        outs.append(v.astype(jnp.int8))
    return jnp.concatenate(outs, axis=-2)


def _mm_i4p_kernel(x_ref, wp_ref, s_ref, o_ref, acc_ref, *, nk: int,
                   k8: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wp_ref[:]                                    # (bk8, bn) i32
    for j in range(8):
        plane = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, 28 - 4 * j), 28).astype(jnp.bfloat16)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:, j * k8:(j + 1) * k8], plane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                              "block_k8", "block_n"))
def quant_matmul_int4_planes(x, w_planes, scale, *, out_dtype=jnp.bfloat16,
                             interpret: bool = False, block_k8: int = 0,
                             block_n: int = 0):
    """x: (R, K) bf16; w_planes: (K/8, N) int32 (pack_int4_planes);
    scale: (1|, N) f32 — the non-stacked variant (lm_head etc.)."""
    K8, N = w_planes.shape
    K = K8 * 8
    x, R = _pad_rows(x.astype(jnp.bfloat16))
    Rp = x.shape[0]
    bn = block_n or _pick_block(N, (1024, 512, 256, 128))
    bk8 = block_k8 or _pick_block(K8, (256, 128, 64, 32, 16, 8))
    nk = K8 // bk8
    xt = x.reshape(Rp, 8, nk, bk8).transpose(0, 2, 1, 3).reshape(Rp, K)
    out = pl.pallas_call(
        functools.partial(_mm_i4p_kernel, nk=nk, k8=bk8),
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, 8 * bk8), lambda n, k: (0, k)),
            pl.BlockSpec((bk8, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xt, w_planes, scale.reshape(1, N))
    return out[:R]


def quant_matmul_int4_planes_xla(x, w_planes, scale, out_dtype=jnp.bfloat16):
    """XLA fallback (CPU / prefill shapes): unpack planes + one dot."""
    w = unpack_int4_planes(w_planes)                 # (K, N) int8
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * scale.reshape(-1)).astype(out_dtype)


# ---------------------------------------------------------------------------
# int4 'bf16-pair' packing — unpack by BIT CONSTRUCTION, not arithmetic
#
# The plane kernel above pays 2 i32 shifts + 1 convert per weight value
# (Mosaic legalizes no i8/i16 vector shifts).  This format packs nibbles so
# ONE extraction pass yields TWO bf16 values directly:
#
#   word[k8, n] (i32) = Σ_p biased[plane 2p  ][k8, n] << 4p
#                     | Σ_p biased[plane 2p+1][k8, n] << (16 + 4p)
#   (biased = q + 8 ∈ [0, 15]; 8 planes split K into contiguous row groups)
#
#   pass p:  t  = ((word >> 4p) & 0x000F000F) | 0x43004300
#            wb = pltpu.bitcast(t, bf16)              # (2·bk8, bn)
#
# bf16 bit pattern 0x4300 | v equals 128 + v EXACTLY (v < 2^7 sits in the
# 7-bit mantissa at exponent 2^7), so each pass costs shr+and+or+bitcast for
# 2 values ≈ half the plane kernel's VPU work.  Measured on-chip the bitcast
# row-interleaves: bf16 row 2i = low halves, row 2i+1 = high halves of i32
# row i (scripts/bench_int4_pairs.py validates this before timing), so the
# caller interleaves x's plane rows to match (_rearrange_x_pairs).  The
# constant +136 bias (128 + the nibble's +8) leaves via the fp32 epilogue:
# y = (acc − 136·rowsum(x))·scale, with rowsum computed by XLA outside the
# kernel (one fused reduction over x, negligible next to the weight stream).
#
# NUMERICS — why this format is OPT-IN, not the default: the epilogue
# subtracts two ~136·rowsum(x)-magnitude fp32 numbers, leaving ~4e-6-of-max
# ABSOLUTE error per matmul (measured 1e-4 on outputs of max 23.6).  That
# is far inside the bf16 ulp of large entries but perturbs entries below
# ~0.1% of max, and the perturbation compounds through layers: a 2-layer
# random tiny decoder drifts 1.9e-2 relative at the logits and flips
# near-tie argmaxes.  Measured dead ends for making it exact at speed
# (2026-08, v5e): (a) subtracting the bias in bf16 on the unpacked tile
# (wb − 136 is exact: v−8 ∈ [−8,7]) gives exactness but costs the entire
# win back — 1394 µs vs planes 1416 in the chained harness; (b) in-stream
# sentinel compensation rows (q=0 ⇒ constructed 136, x slot = −Σblock)
# does NOT reduce the error (1.2e-4 vs 1.0e-4) — the MXU's internal fp32
# accumulation was never the problem, the epilogue cancellation is.  The
# exact plane format stays the default; use pairs for throughput-first
# serving (+5.2% in-situ at 14B B=16: 15.56 vs 16.38 ms/step).


def pack_int4_pairs(q):
    """q: (..., K, N) ints in [-8, 7] → (..., K/8, N) int32 'bf16-pair'
    words (see block comment above).  Plane 2p rides bits [4p, 4p+4); plane
    2p+1 rides bits [16+4p, 16+4p+4)."""
    K = q.shape[-2]
    assert K % 8 == 0, "pack_int4_pairs needs K % 8 == 0"
    K8 = K // 8
    qb = (jnp.asarray(q, jnp.int32) + 8) & 0xF
    out = jnp.zeros(q.shape[:-2] + (K8, q.shape[-1]), jnp.int32)
    for p in range(4):
        lo = qb[..., (2 * p) * K8:(2 * p + 1) * K8, :]
        hi = qb[..., (2 * p + 1) * K8:(2 * p + 2) * K8, :]
        out = out | jax.lax.shift_left(lo, 4 * p)
        out = out | jax.lax.shift_left(hi, 16 + 4 * p)
    return out


def unpack_int4_pairs(packed):
    """Inverse of pack_int4_pairs: (..., K/8, N) i32 → (..., K, N) int8."""
    outs = []
    for p in range(4):
        lo = (jax.lax.shift_right_logical(packed, 4 * p) & 0xF) - 8
        hi = (jax.lax.shift_right_logical(packed, 16 + 4 * p) & 0xF) - 8
        outs.append(lo.astype(jnp.int8))
        outs.append(hi.astype(jnp.int8))
    return jnp.concatenate(outs, axis=-2)


def _rearrange_x_pairs(x, nk: int, bk8: int):
    """(R, K) → per-k-block, per-pass, ROW-INTERLEAVED plane order so the
    kernel's static x slice for pass p lines up with bitcast's interleaved
    bf16 rows (row 2i = plane 2p row i, row 2i+1 = plane 2p+1 row i)."""
    R, K = x.shape
    xr = x.reshape(R, 4, 2, nk, bk8)        # (R, pass, parity, block, row)
    return xr.transpose(0, 3, 1, 4, 2).reshape(R, K)


def _mm_i4w_body(w, x_ref, acc_ref, k8: int):
    mask = jnp.int32(0x000F000F)
    magic = jnp.int32(0x43004300)
    for p in range(4):
        t = w if p == 0 else jax.lax.shift_right_logical(w, 4 * p)
        t = (t & mask) | magic
        wb = pltpu.bitcast(t, jnp.bfloat16)          # (2·bk8, bn)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:, p * 2 * k8:(p + 1) * 2 * k8], wb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _mm_i4w_kernel(x_ref, wp_ref, s_ref, c_ref, o_ref, acc_ref, *,
                   nk: int, k8: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _mm_i4w_body(wp_ref[:], x_ref, acc_ref, k8)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = ((acc_ref[:] - c_ref[:])
                    * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_k8",
                                              "block_n"))
def quant_matmul_int4_pairs(x, w_pairs, scale, *, out_dtype=jnp.bfloat16,
                            block_k8: int = 0, block_n: int = 0):
    """x: (R, K) bf16; w_pairs: (K/8, N) int32 (pack_int4_pairs);
    scale: (1|, N) f32 — the non-stacked variant (lm_head etc.)."""
    K8, N = w_pairs.shape
    K = K8 * 8
    x, R = _pad_rows(x.astype(jnp.bfloat16))
    Rp = x.shape[0]
    bn = block_n or _pick_block(N, (1024, 512, 256, 128))
    bk8 = block_k8 or _pick_block(K8, (256, 128, 64, 32, 16, 8))
    nk = K8 // bk8
    xt = _rearrange_x_pairs(x, nk, bk8)
    corr = 136.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    out = pl.pallas_call(
        functools.partial(_mm_i4w_kernel, nk=nk, k8=bk8),
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, 8 * bk8), lambda n, k: (0, k)),
            pl.BlockSpec((bk8, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
            pl.BlockSpec((Rp, 1), lambda n, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xt, w_pairs, scale.reshape(1, N), corr)
    return out[:R]


def quant_matmul_int4_pairs_xla(x, w_pairs, scale, out_dtype=jnp.bfloat16):
    """XLA fallback (CPU / prefill shapes): unpack pairs + one dot."""
    w = unpack_int4_pairs(w_pairs)                   # (K, N) int8
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * scale.reshape(-1)).astype(out_dtype)


def _mm_i4w_stacked_kernel(idx_ref, x_ref, wp_ref, s_ref, c_ref, o_ref,
                           acc_ref, *, nk: int, k8: int):
    del idx_ref
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _mm_i4w_body(wp_ref[0], x_ref, acc_ref, k8)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = ((acc_ref[:] - c_ref[:])
                    * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                             "block_k8", "block_n"))
def quant_matmul_int4_pairs_stacked(x, w_pairs_all, scale_all, layer, *,
                                    out_dtype=jnp.bfloat16,
                                    interpret: bool = False,
                                    block_k8: int = 0, block_n: int = 0):
    """x: (R, K) bf16; w_pairs_all: (L, K/8, N) int32 (pack_int4_pairs);
    scale_all: (L, 1, N) f32; layer: scalar int32 — scalar-prefetch layer
    indexing, bf16-pair bit-construction unpack."""
    L, K8, N = w_pairs_all.shape
    K = K8 * 8
    x, R = _pad_rows(x.astype(jnp.bfloat16))
    Rp = x.shape[0]
    bn = block_n or _pick_block(N, (1024, 512, 256, 128))
    bk8 = block_k8 or _pick_block(K8, (256, 128, 64, 32, 16, 8))
    nk = K8 // bk8
    xt = _rearrange_x_pairs(x, nk, bk8)
    corr = 136.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    scale_all = scale_all.reshape(L, 1, N)
    idx = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, 8 * bk8), lambda n, k, idx: (0, k)),
            pl.BlockSpec((1, bk8, bn), lambda n, k, idx: (idx[0], k, n)),
            pl.BlockSpec((1, 1, bn), lambda n, k, idx: (idx[0], 0, n)),
            pl.BlockSpec((Rp, 1), lambda n, k, idx: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k, idx: (0, n)),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mm_i4w_stacked_kernel, nk=nk, k8=bk8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(idx, xt, w_pairs_all, scale_all, corr)
    return out[:R]


def _mm_i4p_stacked_kernel(idx_ref, x_ref, wp_ref, s_ref, o_ref, acc_ref, *,
                           nk: int, k8: int):
    del idx_ref
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wp_ref[0]                                    # (bk8, bn) i32
    for j in range(8):
        plane = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, 28 - 4 * j), 28).astype(jnp.bfloat16)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:, j * k8:(j + 1) * k8], plane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                              "block_k8", "block_n"))
def quant_matmul_int4_planes_stacked(x, w_planes_all, scale_all, layer, *,
                                     out_dtype=jnp.bfloat16,
                                     interpret: bool = False,
                                     block_k8: int = 0, block_n: int = 0):
    """x: (R, K) bf16; w_planes_all: (L, K/8, N) int32 (pack_int4_planes);
    scale_all: (L, 1, N) f32; layer: scalar int32 — scalar-prefetch layer
    indexing, native-i32 nibble-plane unpack."""
    L, K8, N = w_planes_all.shape
    K = K8 * 8
    x, R = _pad_rows(x.astype(jnp.bfloat16))
    Rp = x.shape[0]
    bn = block_n or _pick_block(N, (1024, 512, 256, 128))
    bk8 = block_k8 or _pick_block(K8, (256, 128, 64, 32, 16, 8))
    nk = K8 // bk8
    # rearrange x so the kernel's static slice [j*bk8:(j+1)*bk8] within the
    # k-th block is plane j's rows for that block
    xt = x.reshape(Rp, 8, nk, bk8).transpose(0, 2, 1, 3).reshape(Rp, K)
    scale_all = scale_all.reshape(L, 1, N)
    idx = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, 8 * bk8), lambda n, k, idx: (0, k)),
            pl.BlockSpec((1, bk8, bn), lambda n, k, idx: (idx[0], k, n)),
            pl.BlockSpec((1, 1, bn), lambda n, k, idx: (idx[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k, idx: (0, n)),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mm_i4p_stacked_kernel, nk=nk, k8=bk8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(idx, xt, w_planes_all, scale_all)
    return out[:R]


def _mm_i8_stacked_kernel(idx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                          nk: int):
    del idx_ref
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                              "block_k", "block_n"))
def quant_matmul_int8_stacked(x, w_q_all, scale_all, layer, *,
                              out_dtype=jnp.bfloat16,
                              interpret: bool = False, block_k: int = 0,
                              block_n: int = 0):
    """x: (R, K) bf16; w_q_all: (L, K, N) int8; scale_all: (L, 1, N) f32;
    layer: scalar int32 — layer-indexed without materializing the slice."""
    L, K, N = w_q_all.shape
    x, R = _pad_rows(x.astype(jnp.bfloat16))
    Rp = x.shape[0]
    bn = block_n or _pick_block(N, (1024, 512, 256, 128))
    bk = block_k or _pick_block(K, (1024, 512, 256, 128, 64, 32))
    nk = K // bk
    scale_all = scale_all.reshape(L, 1, N)
    idx = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda n, k, idx: (0, k)),
            pl.BlockSpec((1, bk, bn), lambda n, k, idx: (idx[0], k, n)),
            pl.BlockSpec((1, 1, bn), lambda n, k, idx: (idx[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k, idx: (0, n)),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mm_i8_stacked_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(idx, x, w_q_all, scale_all)
    return out[:R]


# ---------------------------------------------------------------------------
# XLA fallbacks (CPU / unsupported shapes) — same numerics, no streaming win


def quant_matmul_int8_xla(x, w_q, scale, out_dtype=jnp.bfloat16):
    y = jax.lax.dot_general(
        x, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * scale.reshape(-1)).astype(out_dtype)


def quant_matmul_int4_xla(x, w_packed, scale, out_dtype=jnp.bfloat16):
    K2 = w_packed.shape[0]
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w_packed, jnp.int8(4)), jnp.int8(4))
    hi = jax.lax.shift_right_arithmetic(w_packed, jnp.int8(4))
    x1 = x[..., :K2]
    x2 = x[..., K2:]
    y = jax.lax.dot_general(
        x1, lo, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + jax.lax.dot_general(
        x2, hi, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * scale.reshape(-1)).astype(out_dtype)
