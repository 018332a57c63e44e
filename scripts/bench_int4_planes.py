"""Probe: nibble-PLANE int4 packing (i32 words, 8 k-planes per word) vs the
shipped split-half byte packing (VERDICT r2 item #3).

Shipped kernel (A): packed int8 bytes; Mosaic has no i8 vector shifts, so
the kernel widens each byte to i32 (sublane unpack = shuffle traffic) before
the two nibble shifts — measured 503 GB/s on the 14B decode (0.61 HBM util).

Plane kernel (E): weights stored AS int32, word[k8, n] packs
q[k8 + j*K/8, n] into nibble j (j = 0..7).  The tile loads as native i32 —
NO widening, no sublane shuffles; per word: 16 i32 shifts + 8 converts
yield 8 bf16 values (3 VPU ops/value), then 8 MXU dots against 8 static
x slices.  Mosaic-legal throughout (only i32 vector shifts).

Run on the real chip:  python scripts/bench_int4_planes.py
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
    pack_int4, quant_matmul_int4)

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


def pack_int4_planes(q):
    """q: (..., K, N) ints in [-8, 7] → (..., K/8, N) int32; nibble j of
    word [k8, n] holds q[k8 + j*K/8, n] (plane-major split)."""
    K = q.shape[-2]
    assert K % 8 == 0
    qs = jnp.asarray(q, jnp.int32) & 0xF
    out = jnp.zeros(q.shape[:-2] + (K // 8, q.shape[-1]), jnp.int32)
    for j in range(8):
        plane = qs[..., j * (K // 8):(j + 1) * (K // 8), :]
        out = out | jax.lax.shift_left(plane, 4 * j)
    return out


def _mm_i4p_kernel(x_ref, wp_ref, s_ref, o_ref, acc_ref, *, nk, k8):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wp_ref[:]                                   # (bk8, bn) i32
    for j in range(8):
        plane = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, 28 - 4 * j), 28).astype(jnp.bfloat16)
        xj = x_ref[:, j * k8:(j + 1) * k8]          # static slice
        acc_ref[:] += jax.lax.dot_general(
            xj, plane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bk8", "bn"))
def mm_i4p(x, wp, scale, bk8=128, bn=1024):
    """x: (R, K) bf16; wp: (K/8, N) int32 plane-packed; scale: (1|, N)."""
    K8, N = wp.shape
    K = K8 * 8
    Rp = x.shape[0]
    nk = K8 // bk8
    # x rearranged so the kernel's per-k-tile slice [j*bk8:(j+1)*bk8] is the
    # j-th plane's rows for THIS tile: x_t[(k*8 + j)*bk8 : ...] = x[j*K8 + k*bk8 : ...]
    xt = x.reshape(Rp, 8, nk, bk8).transpose(0, 2, 1, 3).reshape(Rp, K)
    return pl.pallas_call(
        functools.partial(_mm_i4p_kernel, nk=nk, k8=bk8),
        grid=(N // bn, nk),
        in_specs=[
            pl.BlockSpec((Rp, 8 * bk8), lambda n, k: (0, k)),
            pl.BlockSpec((bk8, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((Rp, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Rp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xt, wp, scale.reshape(1, N))


if __name__ == "__main__":
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    up = jax.random.randint(ks[0], (L, H, M), -8, 8, jnp.int8)
    dn = jax.random.randint(ks[1], (L, M, H), -8, 8, jnp.int8)
    su = jnp.full((L, 1, M), 0.01, jnp.float32)
    sd = jnp.full((L, 1, H), 0.01, jnp.float32)
    PACKED_BYTES = L * (H * M + M * H) // 2

    # correctness: plane kernel == shipped split-half kernel on one layer
    x = jax.random.normal(jax.random.PRNGKey(9), (R, H), jnp.bfloat16)
    ref = quant_matmul_int4(x, pack_int4(up[0]), su[0])
    got = mm_i4p(x, pack_int4_planes(up[0]), su[0])
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print("plane kernel max err vs shipped kernel:", err, flush=True)
    assert err < 0.1, err

    w_a = {"up": pack_int4(up), "dn": pack_int4(dn), "su": su, "sd": sd}

    def step_a(x, lw):
        y = quant_matmul_int4(x, lw["up"], lw["su"])
        return quant_matmul_int4(y, lw["dn"], lw["sd"])

    timed(chain(step_a, w_a), "A i32-shift bytes (shipped)", PACKED_BYTES)

    w_e = {"up": pack_int4_planes(up), "dn": pack_int4_planes(dn),
           "su": su, "sd": sd}
    for bk8, bn in ((128, 1024), (256, 1024), (64, 1024), (128, 2048),
                    (256, 2048), (512, 1024)):
        def step_e(x, lw, bk8=bk8, bn=bn):
            y = mm_i4p(x, lw["up"], lw["su"], bk8=bk8, bn=bn)
            return mm_i4p(y, lw["dn"], lw["sd"], bk8=bk8, bn=bn)
        try:
            timed(chain(step_e, w_e), f"E i32-planes {bk8:4d}x{bn:4d}   ",
                  PACKED_BYTES)
        except Exception as e:
            print(f"E {bk8}x{bn} failed: {type(e).__name__}: {e}"[:200],
                  flush=True)
