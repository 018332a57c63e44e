"""Single-call int4 dequant-matmul probe at the Qwen3-14B MLP shape.

Isolates kernel-sustained bandwidth from pallas_call launch overhead:
one call on (K=5120, N=17408) — 44.6MB packed — repeated STEPS times
inside one jit via scan over stacked weights (fresh weights each
iteration, so HBM is really re-read).

Variants:
  A. shipped i32-shift unpack
  B. AND-based unpack: lo_u = wp & 0xF (i8 bitwise), hi via
     (wpf - lo_uf)*(1/16) in bf16, sign-adjust lo in bf16
  C. int8 same shape (2x bytes) — DMA ceiling reference
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
    quant_matmul_int4, quant_matmul_int8)

R, K, N, STEPS = 16, 5120, 17408, 8
K2 = K // 2
PACKED = K2 * N


def timed(fn, label, bytes_per_step):
    r = fn(); np.asarray(r[:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
    np.asarray(r[:1, :1])
    dt = (time.perf_counter() - t0) / 3 / STEPS
    print(f"{label}: {dt*1e6:8.1f} us/call  {bytes_per_step/dt/1e9:7.1f} GB/s",
          flush=True)


def chain(call, w):
    @jax.jit
    def run(x, w):
        def body(c, lw):
            y = call(c, lw)
            return (c + y[:, :K] * 0).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, x, w)
        return c
    x0 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (R, K), jnp.bfloat16))()
    return lambda: run(x0, w)


def _mm_i4and_kernel(x1_ref, x2_ref, wp_ref, s_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wp = wp_ref[:]
    lo_u = (wp & jnp.int8(0xF)).astype(jnp.bfloat16)       # [0, 15]
    wpf = wp.astype(jnp.bfloat16)
    hi = (wpf - lo_u) * jnp.bfloat16(1.0 / 16.0)           # [-8, 7]
    lo = lo_u - jnp.where(lo_u >= jnp.bfloat16(8), jnp.bfloat16(16),
                          jnp.bfloat16(0))
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


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def mm_i4and(x, wp, scale, bk=512, bn=1024):
    K2_, N_ = wp.shape
    Rp = x.shape[0]
    x1, x2 = x[:, :K2_], x[:, K2_:]
    nk = K2_ // bk
    return pl.pallas_call(
        functools.partial(_mm_i4and_kernel, nk=nk),
        grid=(N_ // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((Rp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Rp, N_), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x1, x2, wp, scale.reshape(1, N_))


if __name__ == "__main__":
    kk = jax.random.split(jax.random.PRNGKey(0), 2)
    wp = jax.random.randint(kk[0], (STEPS, K2, N), -128, 128, jnp.int8)
    sc = jnp.full((STEPS, 1, N), 0.01, jnp.float32)
    w = {"wp": wp, "s": sc}

    timed(chain(lambda x, lw: quant_matmul_int4(x, lw["wp"], lw["s"]), w),
          "A i32-shift (shipped)   ", PACKED)
    for bk, bn in ((512, 1024), (512, 2048)):
        try:
            timed(chain(lambda x, lw, bk=bk, bn=bn: mm_i4and(
                x, lw["wp"], lw["s"], bk=bk, bn=bn), w),
                f"B and-unpack {bk:4d}x{bn:4d}", PACKED)
        except Exception as e:
            print(f"B {bk}x{bn} failed: {type(e).__name__}: {e}"[:160],
                  flush=True)
    del w, wp
    w8 = {"wp": jax.random.randint(kk[1], (STEPS, K, N), -128, 128, jnp.int8),
          "s": sc}
    timed(chain(lambda x, lw: quant_matmul_int8(x, lw["wp"], lw["s"]), w8),
          "C int8 2x-bytes ref     ", PACKED * 2)
