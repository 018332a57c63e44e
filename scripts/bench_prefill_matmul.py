"""MXU rate probe at PREFILL shapes: mixed bf16xint8 vs bf16 dot.

Decode (M small) measured ~101 TOP/s for the mixed bf16xint8 dot (the
weight-tile convert is not amortized when each weight tile meets one row
tile).  Prefill reuses each weight tile across M/8 row tiles, so the
question is whether the mixed dot already reaches the bf16 MXU peak
(~197 TFLOP/s on v5e) at M~1.6k, or whether a per-layer
dequantize-then-bf16-dot (extra ~3x weight-bytes HBM round trip,
amortized over M rows) is faster for the compute-bound prefill path.

MEASURED (M=1664, K=4096, N=14336, v5e): mixed 84.0 / pure-bf16 81.4 /
dequant-then-dot 68.3 TFLOP/s — the mixed dot TIES the bf16 dot at
prefill shapes (the in-stream convert amortizes) and materializing a
dequantized copy only adds bytes.  The prefill path keeps the mixed dot.
M sweep (mixed): 128→10.3, 512→39.6, 1024→57.5, 1664→82.1,
3328→112.2 TFLOP/s.

Times the op INSIDE one jit (loop via lax.fori_loop over a donated
accumulator) to avoid the ~0.9 ms/call tunnel dispatch floor; reads one
small slice to sync (block_until_ready does not reliably block through
the tunnel — CLAUDE.md).

Run: python scripts/bench_prefill_matmul.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    np.asarray(fn(*args))                       # warmup + sync
    t0 = time.perf_counter()
    np.asarray(fn(*args))                       # host transfer = real sync
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    M, K, N = 1664, 4096, 14336
    ITERS = 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.standard_normal((N,)) * 0.01, jnp.float32)
    wb = (wq.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    flops = 2 * M * K * N  # per dot (timeit returns per-op time)

    # The loop body must (a) consume EVERY output element (a sliced
    # accumulator lets XLA shrink the dot itself) and (b) feed the carry
    # back into the operand (or XLA hoists the loop-invariant dot and the
    # loop times nothing).  acc*1e-30 keeps the perturbation numerically
    # invisible but unfoldable.

    def _loop(dotfn, x, *ws):
        def body(_, acc):
            xi = x * (1 + acc * 1e-30).astype(x.dtype)
            y = dotfn(xi, *ws)
            # NON-LINEAR reduction: sum(x@w) alone gets algebraically
            # rewritten to colsum(x)@w, eliding the M-dim entirely
            yf = y.astype(jnp.float32)
            return jnp.sum(yf * yf) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def mixed(x, wq, scale):
        def d(xi, wq, scale):
            y = jax.lax.dot_general(
                xi, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (y * scale).astype(jnp.bfloat16)
        return _loop(d, x, wq, scale)

    @jax.jit
    def pure_bf16(x, wb):
        def d(xi, wb):
            return jax.lax.dot_general(
                xi, wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return _loop(d, x, wb)

    @jax.jit
    def dequant_then_dot(x, wq, scale):
        def d(xi, wq, scale):
            w = (wq.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                xi, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return _loop(d, x, wq, scale)

    for name, fn, args in (
        ("mixed_bf16xint8", mixed, (x, wq, scale)),
        ("pure_bf16", pure_bf16, (x, wb)),
        ("dequant_then_dot", dequant_then_dot, (x, wq, scale)),
    ):
        dt = timeit(fn, *args)
        print(f"{name:20s} {dt*1e3:7.3f} ms/op "
              f"{flops/dt/1e12:7.1f} TFLOP/s")

    # M sweep for the mixed dot: where does conversion amortize?
    for Msw in (128, 256, 512, 1024, 1664, 3328):
        xs = jnp.asarray(rng.standard_normal((Msw, K)), jnp.bfloat16)
        dt = timeit(mixed, xs, wq, scale)
        fl = 2 * Msw * K * N
        print(f"mixed M={Msw:5d}  {dt*1e3:7.3f} ms/op "
              f"{fl/dt/1e12:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
