"""Probe int4 dequant-matmul unpack strategies (v5e, R=16 decode rows).

The shipped kernel widens packed bytes to i32 for the nibble shifts
(Mosaic lacks i8 vector shifts) — 4x the VPU register traffic of the
payload.  Candidates:
  A. i32-shift unpack (shipped baseline)
  B. bf16-arithmetic unpack: convert i8->bf16 once, hi=floor(w/16),
     lo=w-16*hi (in [0,15]), signed-adjust lo -= 16*(lo>=8)
  C. native jnp.int4 weight refs (Mosaic i4 vector load + convert), if
     supported
  D. int8 kernel on the same logical weights (2x the bytes) — the
     bandwidth ceiling reference
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
    pack_int4, quant_matmul_int4, quant_matmul_int8)

R, H, M, L, STEPS = 16, 4096, 14336, 4, 20


def timed(fn, label, bytes_per_step):
    r = fn(); np.asarray(r[:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
    np.asarray(r[:1, :1])
    dt = (time.perf_counter() - t0) / 3 / STEPS
    print(f"{label}: {dt*1e6:8.1f} us/step  {bytes_per_step/dt/1e9:7.1f} GB/s",
          flush=True)


def chain(step, w):
    @jax.jit
    def run(x, w):
        def outer(x, _):
            x, _ = jax.lax.scan(lambda c, lw: (step(c, lw), None), x, w)
            return x, None
        x, _ = jax.lax.scan(outer, x, None, length=STEPS)
        return x
    x0 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (R, H), jnp.bfloat16))()
    return lambda: run(x0, w)


# weights: L layers of (H, M) + (M, H), packed int4
def make_w(pack):
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    up = jax.random.randint(ks[0], (L, H, M), -8, 8, jnp.int8)
    dn = jax.random.randint(ks[1], (L, M, H), -8, 8, jnp.int8)
    return {"up": pack(up), "dn": pack(dn),
            "su": jnp.full((L, 1, M), 0.01, jnp.float32),
            "sd": jnp.full((L, 1, H), 0.01, jnp.float32)}


PACKED_BYTES = L * (H * M + M * H) // 2


# --- B: bf16-arithmetic unpack kernel -------------------------------------
def _mm_i4f_kernel(x1_ref, x2_ref, wp_ref, s_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wf = wp_ref[:].astype(jnp.float32)
    hi = jnp.floor(wf * (1.0 / 16.0))
    lo = wf - hi * 16.0                      # [0, 15]
    lo = lo - jnp.where(lo >= 8.0, 16.0, 0.0)
    acc_ref[:] += jax.lax.dot_general(
        x1_ref[:], lo.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x2_ref[:], hi.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def mm_i4f(x, wp, scale, bk=512, bn=1024):
    K2, N = wp.shape
    Rp = x.shape[0]
    x1, x2 = x[:, :K2], x[:, K2:]
    nk = K2 // bk
    return pl.pallas_call(
        functools.partial(_mm_i4f_kernel, nk=nk),
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((Rp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x1, x2, wp, scale.reshape(1, N))


# --- C: native int4 refs ---------------------------------------------------
def _mm_i4n_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk):
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


@functools.partial(jax.jit, static_argnames=("bk", "bn"))
def mm_i4n(x, w4, scale, bk=1024, bn=1024):
    K, N = w4.shape
    Rp = x.shape[0]
    nk = K // bk
    return pl.pallas_call(
        functools.partial(_mm_i4n_kernel, nk=nk),
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w4, scale.reshape(1, N))


if __name__ == "__main__":
    w = make_w(lambda q: pack_int4(q))

    def step_a(x, lw):
        y = quant_matmul_int4(x, lw["up"], lw["su"])
        return quant_matmul_int4(y, lw["dn"], lw["sd"])

    timed(chain(step_a, w), "A i32-shift (shipped) ", PACKED_BYTES)

    for bk, bn in ((512, 1024), (1024, 1024), (256, 2048), (512, 2048)):
        def step_b(x, lw, bk=bk, bn=bn):
            y = mm_i4f(x, lw["up"], lw["su"], bk=bk, bn=bn)
            return mm_i4f(y, lw["dn"], lw["sd"], bk=bk, bn=bn)
        try:
            timed(chain(step_b, w), f"B f32-floor {bk:4d}x{bn:4d}",
                  PACKED_BYTES)
        except Exception as e:
            print(f"B {bk}x{bn} failed: {type(e).__name__}: {e}"[:200],
                  flush=True)

    try:
        w4 = {"up": jax.random.randint(
                  jax.random.PRNGKey(5), (L, H, M), -8, 8, jnp.int8
              ).astype(jnp.int4),
              "dn": jax.random.randint(
                  jax.random.PRNGKey(6), (L, M, H), -8, 8, jnp.int8
              ).astype(jnp.int4),
              "su": w["su"], "sd": w["sd"]}

        def step_c(x, lw):
            y = mm_i4n(x, lw["up"], lw["su"])
            return mm_i4n(y, lw["dn"], lw["sd"])

        timed(chain(step_c, w4), "C native-int4 refs    ", PACKED_BYTES)
    except Exception as e:
        print(f"C failed: {type(e).__name__}: {e}"[:300], flush=True)

    w8 = make_w(lambda q: q)   # unpacked int8, 2x bytes

    def step_d(x, lw):
        y = quant_matmul_int8(x, lw["up"], lw["su"])
        return quant_matmul_int8(y, lw["dn"], lw["sd"])

    timed(chain(step_d, w8), "D int8 2x-bytes ref   ", PACKED_BYTES * 2)
