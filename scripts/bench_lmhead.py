"""Probe the int8 lm_head matmul (logits) at serving shapes: XLA
mixed-dtype dot_general (the shipped linear() int8 path) vs the Pallas
quant_matmul_int8 kernel.  bench_spec_floor.py measured logits at
2.59 ms (R=16) / 5.15 ms (R=80) where the 525 MB int8 weight read floors
at ~0.64 ms — if the Pallas kernel recovers the roofline here, route the
rows<=256 int8 linear() through it like the int4 paths already do.

    python scripts/bench_lmhead.py [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.kernels.quant_matmul import quant_matmul_int8  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, V = 4096, 128256

_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)

kk = jax.random.PRNGKey(0)
w_q = jax.random.bits(kk, (H, V), jnp.uint8).astype(jnp.int8)
scale = jnp.ones((1, V), jnp.float32) * 0.01
gb = H * V / 1e9


@jax.jit
def xla_head(x, w, s):
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * s).astype(jnp.bfloat16)


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jax.device_get(out[:1, :8]))      # sync (CLAUDE.md: host xfer)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.device_get(out[:1, :8]))
    return (time.perf_counter() - t0) / REPS


for R in (16, 80, 128):
    x = jax.random.normal(jax.random.PRNGKey(R), (R, H), jnp.bfloat16)
    t_x = timeit(xla_head, x, w_q, scale)
    t_p = timeit(lambda a, b, c: quant_matmul_int8(a, b, c), x, w_q, scale)
    y0 = np.asarray(xla_head(x, w_q, scale), np.float32)
    y1 = np.asarray(quant_matmul_int8(x, w_q, scale), np.float32)
    err = np.abs(y0 - y1).max() / max(1e-9, np.abs(y0).max())
    print(f"R={R:4d}  xla {t_x*1e3:7.2f} ms ({gb/t_x:6.1f} GB/s)   "
          f"pallas {t_p*1e3:7.2f} ms ({gb/t_p:6.1f} GB/s)   relerr {err:.2e}",
          flush=True)
