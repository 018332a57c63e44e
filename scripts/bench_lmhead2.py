"""Tile-shape sweep for the int8 lm_head matmul (follow-up to
bench_lmhead.py: XLA 341 GB/s / Pallas-default 252 GB/s vs the 819
roofline at V=128256).  Hypothesis: the default (bn=256, bk=1024) grid
runs ~2000 tiny steps whose fixed dispatch (~0.85 us, see the verify
kernel (B,2) rework) dominates.  Sweep bn/bk incl. a full-K single-pass
grid and a padded V=129024 (divisible by 1024) to see what the shape is
worth before wiring anything into linear().

    python scripts/bench_lmhead2.py [reps]
"""
import functools
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
VP = 129024                      # = 126 * 1024

_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)

kk = jax.random.PRNGKey(0)
w_q = jax.random.bits(kk, (H, V), jnp.uint8).astype(jnp.int8)
w_qp = jnp.pad(w_q, ((0, 0), (0, VP - V)))
scale = jnp.ones((1, V), jnp.float32) * 0.01
scale_p = jnp.pad(scale, ((0, 0), (0, VP - V)))
jax.block_until_ready(w_qp)


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jax.device_get(out[:1, :8]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.device_get(out[:1, :8]))
    return (time.perf_counter() - t0) / REPS


@jax.jit
def xla_head_p(x, w, s):
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * s).astype(jnp.bfloat16)


for R in (16, 80):
    x = jax.random.normal(jax.random.PRNGKey(R), (R, H), jnp.bfloat16)
    gb = H * V / 1e9
    gbp = H * VP / 1e9
    rows = []
    for name, w, s, g, bn, bk in (
        ("orig bn256 bk1024", w_q, scale, gb, 0, 0),
        ("orig bn256 bk4096", w_q, scale, gb, 256, 4096),
        ("orig bn384 bk4096", w_q, scale, gb, 384, 4096),
        ("pad  bn1024 bk1024", w_qp, scale_p, gbp, 1024, 1024),
        ("pad  bn1024 bk4096", w_qp, scale_p, gbp, 1024, 4096),
        ("pad  bn2048 bk4096", w_qp, scale_p, gbp, 2048, 4096),
    ):
        fn = functools.partial(quant_matmul_int8, block_n=bn, block_k=bk)
        try:
            t = timeit(fn, x, w, s)
        except Exception as e:
            print(f"R={R:3d} {name:20s} FAILED: {str(e)[:120]}", flush=True)
            continue
        print(f"R={R:3d} {name:20s} {t*1e3:7.2f} ms ({g/t:6.1f} GB/s)",
              flush=True)
    t = timeit(xla_head_p, x, w_qp, scale_p)
    print(f"R={R:3d} {'pad  xla':20s} {t*1e3:7.2f} ms ({gbp/t:6.1f} GB/s)",
          flush=True)
