"""2D vs 3D activation shape for the int8 lm_head mixed-dtype dot_general
(bench_spec_floor.py measured the in-situ (B,G,H) logits at ~4.25 ms
device-time where the same matmul probed 2D at (B*G,H) is ~0.6 ms).

    python scripts/bench_logits3d.py [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, V, B, G = 4096, 128256, 16, 5

_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)

w_q = jax.random.bits(jax.random.PRNGKey(0), (H, V), jnp.uint8).astype(jnp.int8)
scale = jnp.ones((1, V), jnp.float32) * 0.01
x3 = jax.random.normal(jax.random.PRNGKey(1), (B, G, H), jnp.bfloat16)
x2 = x3.reshape(B * G, H)
x1 = x3[:, :1]            # (B, 1, H) — the single-token decode shape


def head(x, w, s):
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return ((y * s).astype(jnp.bfloat16)).astype(jnp.float32)


f3 = jax.jit(lambda w, s, x: head(x, w, s)[..., :8])
f2 = jax.jit(lambda w, s, x: head(x, w, s)[..., :8])
fflat = jax.jit(lambda w, s, x: head(
    x.reshape(-1, x.shape[-1]), w, s).reshape(*x.shape[:-1], -1)[..., :8])


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / REPS


gb = H * V / 1e9
for name, fn, x in (("3d (B,G,H)", f3, x3), ("2d (B*G,H)", f2, x2),
                    ("3d flatten wrap", fflat, x3),
                    ("3d (B,1,H)", f3, x1),
                    ("3d flat (B,1,H)", fflat, x1)):
    t = timeit(fn, w_q, scale, x)
    print(f"{name:18s} {t*1e3:7.2f} ms ({gb/t:6.1f} GB/s apparent)",
          flush=True)
