"""Probe: int4 'bf16-pair' unpack vs the shipped nibble-plane kernel.

The shipped plane kernel (kernels/quant_matmul.py quant_matmul_int4_planes)
spends 3 VPU ops per weight value (shl + shr + convert, i32-only — Mosaic
legalizes no i8/i16 vector shifts).  This probe packs nibbles so one
extraction pass yields TWO bf16 values by BIT CONSTRUCTION instead of
arithmetic conversion:

  word[k2, n] (i32) = sum_p biased[plane 2p][k2, n] << 4p
                    | sum_p biased[plane 2p+1][k2, n] << (16 + 4p)
  (biased = q + 8 in [0, 15]; planes split K into 8 contiguous row groups)

  pass p:  t = ((w >> 4p) & 0x000F000F) | 0x43004300
           wb = pltpu.bitcast(t, bf16)          # (2*bk8, bn)
  bf16 bit pattern 0x4300 | v == 128 + v exactly (v < 2^7 fits the 7-bit
  mantissa at exponent 2^7), so wb rows interleave plane 2p (+136) and
  plane 2p+1 (+136); measured on-chip: bitcast row 2i = low half, row
  2i+1 = high half of i32 row i (this script validates parity first).

  The +136 bias leaves via the epilogue: y = (acc - 136*rowsum(x)) * scale
  — the rowsum is computed by the CALLER (one XLA reduction), so the
  kernel pays shr+and+or+bitcast per 2 values ≈ 1.5-2 VPU ops/value.

Run on the real chip:  python scripts/bench_int4_pairs.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.kernels.quant_matmul import (  # noqa: E402
    pack_int4_planes, quant_matmul_int4_planes, _pick_block, _pad_rows)


def pack_int4_pairs(q):
    """q: (K, N) ints in [-8, 7] -> (K/8, N) int32 pair-plane words."""
    K = q.shape[-2]
    assert K % 8 == 0
    K8 = K // 8
    qb = (jnp.asarray(q, jnp.int32) + 8) & 0xF
    out = jnp.zeros(q.shape[:-2] + (K8, q.shape[-1]), jnp.int32)
    for p in range(4):
        lo = qb[..., (2 * p) * K8:(2 * p + 1) * K8, :]
        hi = qb[..., (2 * p + 1) * K8:(2 * p + 2) * K8, :]
        out = out | jax.lax.shift_left(lo, 4 * p)
        out = out | jax.lax.shift_left(hi, 16 + 4 * p)
    return out


def _rearrange_x_pairs(x, nk, bk8):
    """(R, K) -> per-k-block, per-pass, row-interleaved column order."""
    R, K = x.shape
    xr = x.reshape(R, 4, 2, nk, bk8)        # (R, p, parity, g, i)
    return xr.transpose(0, 3, 1, 4, 2).reshape(R, K)


def _mm_i4pair_kernel(x_ref, wp_ref, s_ref, c_ref, o_ref, acc_ref, *,
                      nk: int, k8: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wp_ref[:]                            # (bk8, bn) i32
    mask = jnp.int32(0x000F000F)
    magic = jnp.int32(0x43004300)
    for p in range(4):
        t = w if p == 0 else jax.lax.shift_right_logical(w, 4 * p)
        t = (t & mask) | magic
        wb = pltpu.bitcast(t, jnp.bfloat16)  # (2*bk8, bn)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:, p * 2 * k8:(p + 1) * 2 * k8], wb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = ((acc_ref[:] - c_ref[:])
                    * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_k8",
                                              "block_n"))
def quant_matmul_int4_pairs(x, w_pairs, scale, *, out_dtype=jnp.bfloat16,
                            block_k8: int = 0, block_n: int = 0):
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
        functools.partial(_mm_i4pair_kernel, nk=nk, k8=bk8),
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


def main():
    rng = np.random.default_rng(0)

    # ---- parity ---------------------------------------------------------
    K, N, R = 1024, 512, 16
    q = rng.integers(-8, 8, (K, N))
    scale = rng.standard_normal((1, N)).astype(np.float32) * 0.02
    x = rng.standard_normal((R, K)).astype(np.float32)
    ref = (x @ (q.astype(np.float32) * scale)).astype(np.float32)
    got = np.asarray(quant_matmul_int4_pairs(
        jnp.asarray(x, jnp.bfloat16), pack_int4_pairs(q),
        jnp.asarray(scale))).astype(np.float32)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    print(f"parity: max rel err {rel.max():.4f} (bf16 x — expect ~1e-2)")
    assert rel.max() < 0.05, "parity FAILED"

    # ---- A/B at the Qwen3-14B hot shape ---------------------------------
    K, N = 5120, 17408
    L, STEPS = 4, 10
    for R in (16, 24):
        q = rng.integers(-8, 8, (L, K, N)).astype(np.int8)
        scale = (rng.standard_normal((L, 1, N)).astype(np.float32) * 0.02)
        planes = jnp.asarray(np.stack([np.asarray(pack_int4_planes(q[i]))
                                       for i in range(L)]))
        pairs = jnp.asarray(np.stack([np.asarray(pack_int4_pairs(q[i]))
                                      for i in range(L)]))
        sc = jnp.asarray(scale)
        x0 = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)

        def chain(mm, w):
            @jax.jit
            def run(x, w, s):
                def outer(x, _):
                    def inner(c, lws):
                        lw, ls = lws
                        y = mm(c, lw, ls)
                        return y[:, :K].astype(jnp.bfloat16), None
                    x, _ = jax.lax.scan(inner, x, (w, s))
                    return x, None
                x, _ = jax.lax.scan(outer, x, None, length=STEPS)
                return x
            return lambda: run(x0, w, sc)

        nbytes = L * K * N // 2
        for label, fn in (
            ("planes", chain(lambda c, lw, ls: quant_matmul_int4_planes(
                c, lw, ls), planes)),
            ("pairs ", chain(lambda c, lw, ls: quant_matmul_int4_pairs(
                c, lw, ls), pairs)),
        ):
            r = fn(); np.asarray(r[:1, :1])
            t0 = time.perf_counter()
            for _ in range(3):
                r = fn()
            np.asarray(r[:1, :1])
            dt = (time.perf_counter() - t0) / 3 / STEPS
            print(f"R={R} {label}: {dt*1e6:8.1f} us/step "
                  f"{nbytes/dt/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
