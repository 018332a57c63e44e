"""Third lm_head probe: is ~350 GB/s (bench_lmhead2.py plateau at
V=128256) a universal int8-matmul cap, or specific to the vocab shape?
Times the XLA mixed-dtype dot and the Pallas kernels at the 8B DECODE
layer shapes (which must average ~675 GB/s for the measured 11.11 ms
B=16 step to be possible) against the vocab shape, plus a chunked-convert
kernel variant (sub-chunk the w astype so the bf16 copy never exceeds
~512 KB — hypothesis: the full-tile astype copy breaks double-buffering).

    python scripts/bench_lmhead3.py [reps]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.kernels.quant_matmul import quant_matmul_int8  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 32

_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)


@jax.jit
def xla_head(x, w, s):
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * s).astype(jnp.bfloat16)


def _chunk_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk, nc, bc):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(c, acc):
        w = w_ref[pl.ds(c * bc, bc), :].astype(jnp.bfloat16)
        xr = x_ref[:, pl.ds(c * bc, bc)]
        return acc + jax.lax.dot_general(
            xr, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc_ref[:] = jax.lax.fori_loop(0, nc, body, acc_ref[:])

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bk", "bc"))
def chunk_mm(x, w_q, scale, *, bn, bk, bc):
    K, N = w_q.shape
    R = x.shape[0]
    nk, nc = K // bk, bk // bc
    return pl.pallas_call(
        functools.partial(_chunk_kernel, nk=nk, nc=nc, bc=bc),
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((R, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w_q, scale)


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jax.device_get(out[:1, :8]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.device_get(out[:1, :8]))
    return (time.perf_counter() - t0) / REPS


R = 16
for K, N, tag in ((4096, 4096, "q/o   "), (4096, 14336, "gateup"),
                  (14336, 4096, "down  "), (4096, 128256, "vocab ")):
    kk = jax.random.PRNGKey(N)
    w_q = jax.random.bits(kk, (K, N), jnp.uint8).astype(jnp.int8)
    scale = jnp.ones((1, N), jnp.float32) * 0.01
    x = jax.random.normal(jax.random.PRNGKey(R), (R, K), jnp.bfloat16)
    gb = K * N / 1e9
    t_x = timeit(xla_head, x, w_q, scale)
    t_p = timeit(quant_matmul_int8, x, w_q, scale)
    line = (f"{tag} K={K:5d} N={N:6d}  xla {t_x*1e3:6.2f} ms "
            f"({gb/t_x:6.1f} GB/s)  pallas {t_p*1e3:6.2f} ms "
            f"({gb/t_p:6.1f} GB/s)")
    if N % 1024 == 0 or N == 128256:
        bn = 1024 if N % 1024 == 0 else 256
        try:
            t_c = timeit(functools.partial(chunk_mm, bn=bn, bk=1024, bc=256),
                         x, w_q, scale)
            y0 = np.asarray(xla_head(x, w_q, scale), np.float32)
            y1 = np.asarray(chunk_mm(x, w_q, scale, bn=bn, bk=1024, bc=256),
                            np.float32)
            err = np.abs(y0 - y1).max() / max(1e-9, np.abs(y0).max())
            line += f"  chunk {t_c*1e3:6.2f} ms ({gb/t_c:6.1f} GB/s, e{err:.0e})"
        except Exception as e:
            line += f"  chunk FAILED: {str(e)[:60]}"
    print(line, flush=True)
