"""Does Mosaic's int8 x int8 tpu.matmul hit the native int8 MXU rate?

CLAUDE.md records ~101 TOP/s for BOTH bf16 x int8 and int8 x int8 through
XLA dot_general at decode B=128 — i.e. XLA never engages the 2x int8 MXU
mode (v5e peak: 197 bf16 TFLOP/s, 394 int8 TOP/s).  If a Pallas kernel
issuing i8 x i8 dots with i32 accumulation reaches ~2x, the MXU-bound
B=128 weight matmuls (13.2 of 18.7 ms/step at 8B) halve.

Shapes: the 8B layer matmul chain at R=128 decode rows.
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

R, K, N, L, REP = 128, 4096, 14336, 8, 4
FLOPS = 2 * R * K * N * L


def timed(fn, label):
    r = fn(); np.asarray(r[:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
    np.asarray(r[:1, :1])
    dt = (time.perf_counter() - t0) / 3 / REP
    print(f"{label}: {dt*1e3:8.3f} ms/pass  {FLOPS/dt/1e12:7.1f} TOP/s",
          flush=True)


w8 = jax.jit(lambda k: jax.random.bits(k, (L, K, N), jnp.uint8
                                       ).astype(jnp.int8))(
    jax.random.PRNGKey(0))
xb = jax.jit(lambda k: jax.random.normal(k, (R, K), jnp.bfloat16))(
    jax.random.PRNGKey(1))
x8 = jax.jit(lambda k: jax.random.bits(k, (R, K), jnp.uint8
                                       ).astype(jnp.int8))(
    jax.random.PRNGKey(2))


# A: XLA mixed bf16 x int8 (the shipped int8 decode path)
@jax.jit
def run_mixed(x, w):
    def outer(c, _):
        def body(c, lw):
            y = jax.lax.dot_general(c, lw, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (y[:, :K] * 1e-4).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, c, w)
        return c, None
    c, _ = jax.lax.scan(outer, x, None, length=REP)
    return c


timed(lambda: run_mixed(xb, w8), "A XLA bf16xint8   ")


# B: XLA int8 x int8, int32 accum
@jax.jit
def run_i8_xla(x, w):
    def outer(c, _):
        def body(c, lw):
            y = jax.lax.dot_general(c, lw, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(y[:, :K] >> 7, -128, 127).astype(jnp.int8), None
        c, _ = jax.lax.scan(body, c, w)
        return c, None
    c, _ = jax.lax.scan(outer, x, None, length=REP)
    return c


timed(lambda: run_i8_xla(x8, w8), "B XLA int8xint8   ")


# C: Pallas int8 x int8 kernel, i32 accumulation on the MXU
def _i8_kernel(x_ref, w_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def mm_i8i8(x, w, bk=512, bn=1024):
    Kd, Nd = w.shape
    nk = Kd // bk
    return pl.pallas_call(
        functools.partial(_i8_kernel, nk=nk),
        grid=(Nd // bn, nk),
        in_specs=[
            pl.BlockSpec((R, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((R, Nd), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w)


@jax.jit
def run_i8_pallas(x, w):
    def outer(c, _):
        def body(c, lw):
            y = mm_i8i8(c, lw)
            return jnp.clip(y[:, :K] >> 7, -128, 127).astype(jnp.int8), None
        c, _ = jax.lax.scan(body, c, w)
        return c, None
    c, _ = jax.lax.scan(outer, x, None, length=REP)
    return c


try:
    timed(lambda: run_i8_pallas(x8, w8), "C Pallas int8xint8")
except Exception as e:
    print(f"C failed: {type(e).__name__}: {e}"[:300], flush=True)


# D: Pallas bf16 x int8 (convert in kernel) — the pallas-controlled mixed ref
def _mix_kernel(x_ref, w_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def mm_mix(x, w, bk=512, bn=1024):
    Kd, Nd = w.shape
    nk = Kd // bk
    return pl.pallas_call(
        functools.partial(_mix_kernel, nk=nk),
        grid=(Nd // bn, nk),
        in_specs=[
            pl.BlockSpec((R, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((R, Nd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w)


@jax.jit
def run_mix_pallas(x, w):
    def outer(c, _):
        def body(c, lw):
            y = mm_mix(c, lw)
            return (y[:, :K] * 1e-4).astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, c, w)
        return c, None
    c, _ = jax.lax.scan(outer, x, None, length=REP)
    return c


try:
    timed(lambda: run_mix_pallas(xb, w8), "D Pallas bf16xint8")
except Exception as e:
    print(f"D failed: {type(e).__name__}: {e}"[:300], flush=True)
