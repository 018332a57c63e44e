"""Probe: int4 'bf16-pair' unpack vs the shipped nibble-plane kernel.

The plane kernel (kernels/quant_matmul.py quant_matmul_int4_planes) spends
3 VPU ops per weight value (shl + shr + convert, i32-only — Mosaic
legalizes no i8/i16 vector shifts).  The pair kernel
(quant_matmul_int4_pairs, same file) packs nibbles so one extraction pass
yields TWO bf16 values by BIT CONSTRUCTION instead of arithmetic
conversion:

  pass p:  t = ((word >> 4p) & 0x000F000F) | 0x43004300
           wb = pltpu.bitcast(t, bf16)          # (2*bk8, bn)

bf16 bit pattern 0x4300 | v == 128 + v exactly (v < 2^7 fits the 7-bit
mantissa at exponent 2^7); measured on-chip the bitcast row-interleaves
(row 2i = low half, row 2i+1 = high half of i32 row i) — this script
validates that parity FIRST, against the plane kernel on identical bf16
inputs.  The +136 bias leaves via the fp32 epilogue subtract of
136*rowsum(x) (computed by XLA outside the kernel).

This is the chained micro-harness (known overhead-bound — in round-3 A/Bs
it under-reports absolute GB/s ~4x vs in-situ decode but RANKS formats
consistently); the decisive in-situ 14B A/B is scripts/bench_int4_formats.py.

Run on the real chip:  python scripts/bench_int4_pairs.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.kernels.quant_matmul import (  # noqa: E402
    pack_int4_pairs, pack_int4_planes, quant_matmul_int4_pairs,
    quant_matmul_int4_planes)


def main():
    rng = np.random.default_rng(0)

    # ---- parity vs the shipped plane kernel (same bf16 inputs) ----------
    K, N, R = 1024, 512, 16
    q = rng.integers(-8, 8, (K, N))
    scale = rng.standard_normal((1, N)).astype(np.float32) * 0.02
    xb = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    ref = np.asarray(quant_matmul_int4_planes(
        xb, pack_int4_planes(q), jnp.asarray(scale))).astype(np.float32)
    got = np.asarray(quant_matmul_int4_pairs(
        xb, pack_int4_pairs(q), jnp.asarray(scale))).astype(np.float32)
    err = np.abs(got - ref).max()
    print(f"parity vs planes kernel: max abs {err:.5f} "
          f"(out scale {np.abs(ref).max():.1f}; one bf16 ulp expected — "
          f"the +136 bias leaves via an fp32 epilogue subtract)")
    assert err < 0.01 * np.abs(ref).max(), "parity FAILED"

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
