"""LM-head cost at spec-verify shapes (bench_spec_floor showed the int8
lm_head at (16, 5, 4096) costing ~5.8 ms where its weight stream is
0.53 GB ≈ 0.64 ms at roofline).  Compares, at rows = 16 and 80:

  xla       the shipped mixed bf16×int8 dot (models/transformer.linear)
  xla+amax  same fused into the argmax consumer (no 41 MB f32 output?)
  pallas    kernels/quant_matmul.quant_matmul_int8
  bf16mat   explicit .astype(bf16) materialization (known-bad reference)

    python scripts/bench_head.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.kernels.quant_matmul import (   # noqa: E402
    quant_matmul_int8, supports_quant_matmul,
)

REPS = 32
H, V = 4096, 128256
_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)

kk = jax.random.PRNGKey(0)
wq = jax.jit(lambda k: (jax.random.bits(k, (H, V), jnp.uint8) >> 1
                        ).astype(jnp.int8))(kk)
scale = jnp.full((V,), 0.01, jnp.float32)
print("weights ready", flush=True)


def timeit(label, fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    gbs = H * V / dt / 1e9
    print(f"{label:10s} {dt*1e3:8.2f} ms   {gbs:6.0f} GB/s", flush=True)
    return dt


@jax.jit
def f_xla(x, wq, scale):
    y = jax.lax.dot_general(x, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * scale).sum(axis=-1)          # force full output


@jax.jit
def f_xla_amax(x, wq, scale):
    y = jax.lax.dot_general(x, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.argmax(y * scale, axis=-1)


@jax.jit
def f_pallas(x, wq, scale):
    y = quant_matmul_int8(x, wq, scale[None, :], out_dtype=jnp.float32)
    return jnp.argmax(y, axis=-1)


@jax.jit
def f_bf16(x, wq, scale):
    y = jnp.matmul(x, wq.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return jnp.argmax(y * scale, axis=-1)


assert supports_quant_matmul(H, V, bits=8)
for rows in (16, 80):
    x = jax.jit(functools.partial(
        jax.random.normal, shape=(rows, H), dtype=jnp.bfloat16))(kk)
    print(f"-- rows={rows}", flush=True)
    timeit("xla", f_xla, x, wq, scale)
    timeit("xla+amax", f_xla_amax, x, wq, scale)
    timeit("pallas", f_pallas, x, wq, scale)
    timeit("bf16mat", f_bf16, x, wq, scale)
