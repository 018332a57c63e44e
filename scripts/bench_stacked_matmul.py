"""Scanned-xs slice-copy vs scalar-prefetch stacked indexing, 14B-ish
chain: L layers x (K->N) int4 matmuls inside one jit scan, x carried.

Theory (scripts/bench_launch_overhead.py): scan-xs weight slices are
MATERIALIZED before each pallas call (~3x HBM traffic); the stacked kernel
reads tiles straight from the (L, K2, N) buffer via scalar-prefetch
index_map."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.kernels.quant_matmul import (   # noqa: E402
    quant_matmul_int4, quant_matmul_int4_stacked)

R, K, N, L, REP = 16, 5120, 5120, 24, 6
K2 = K // 2
BYTES = L * K2 * N


def timed(fn, label):
    r = fn(); np.asarray(r[:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
    np.asarray(r[:1, :1])
    dt = (time.perf_counter() - t0) / 3 / REP
    print(f"{label}: {dt*1e3:8.2f} ms/pass  {BYTES/dt/1e9:7.1f} GB/s",
          flush=True)


wp = jax.random.randint(jax.random.PRNGKey(0), (L, K2, N), -128, 128,
                        jnp.int8)
sc = jnp.full((L, 1, N), 0.01, jnp.float32)
x0 = jax.jit(lambda: jax.random.normal(
    jax.random.PRNGKey(1), (R, K), jnp.bfloat16))()


@jax.jit
def run_xs(x, wp, sc):
    def outer(x, _):
        def body(c, lw):
            y = quant_matmul_int4(c, lw[0], lw[1])
            return (y[:, :K] * 0.01 + c).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, (wp, sc))
        return x, None
    x, _ = jax.lax.scan(outer, x, None, length=REP)
    return x


@jax.jit
def run_stacked(x, wp, sc):
    def outer(x, _):
        def body(c, li):
            y = quant_matmul_int4_stacked(c, wp, sc, li)
            return (y[:, :K] * 0.01 + c).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, jnp.arange(L))
        return x, None
    x, _ = jax.lax.scan(outer, x, None, length=REP)
    return x


def extra():
    """Round-3 additions: stacked nibble-plane int4 vs stacked int8 (the
    2x-bytes bandwidth reference) in the same chained-scan harness."""
    from prot2text_tpu.kernels.quant_matmul import (
        pack_int4_planes, quant_matmul_int4_planes_stacked,
        quant_matmul_int8_stacked, unpack_int4)

    # plane-packed copy of the SAME logical weights
    logical = unpack_int4(np.asarray(wp))          # (L, K, N) int8 in [-8,7]
    wpp = jax.jit(pack_int4_planes)(jnp.asarray(logical))
    a = quant_matmul_int4_stacked(x0, wp, sc, 3)
    b = quant_matmul_int4_planes_stacked(x0, wpp, sc, 3)
    err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print("planes-stacked vs shipped-stacked max err:", err, flush=True)

    @jax.jit
    def run_planes(x, wpp, sc):
        def outer(x, _):
            def body(c, li):
                y = quant_matmul_int4_planes_stacked(c, wpp, sc, li)
                return (y[:, :K] * 0.01 + c).astype(jnp.bfloat16), None
            x, _ = jax.lax.scan(body, x, jnp.arange(L))
            return x, None
        x, _ = jax.lax.scan(outer, x, None, length=REP)
        return x

    timed(lambda: run_planes(x0, wpp, sc), "planes stacked  ")

    w8 = jnp.asarray(logical)                       # int8, 2x packed bytes
    s8 = jnp.full((L, 1, N), 0.01, jnp.float32)

    @jax.jit
    def run_i8(x, w8, s8):
        def outer(x, _):
            def body(c, li):
                y = quant_matmul_int8_stacked(c, w8, s8, li)
                return (y[:, :K] * 0.01 + c).astype(jnp.bfloat16), None
            x, _ = jax.lax.scan(body, x, jnp.arange(L))
            return x, None
        x, _ = jax.lax.scan(outer, x, None, length=REP)
        return x

    timed(lambda: run_i8(x0, w8, s8), "int8 stacked(2x)")


if __name__ == "__main__":
    # correctness first (on-chip, small tolerance vs per-layer kernel)
    a = quant_matmul_int4(x0, wp[3], sc[3])
    b = quant_matmul_int4_stacked(x0, wp, sc, 3)
    err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print("stacked vs sliced max err:", err, flush=True)
    timed(lambda: run_xs(x0, wp, sc), "scan-xs slices  ")
    timed(lambda: run_stacked(x0, wp, sc), "stacked indexed ")
    extra()



