"""Is the int8 lm_head slow for 3D (B, G, H) inputs?  bench_head measured
the 2D mixed bf16xint8 dot at ~1.8 ms while bench_spec_floor measured
decoder_logits on (16, 5, 4096) at ~5.8 ms.  A/B the same dot with a 3D
lhs vs an explicitly flattened one.

    python scripts/bench_head3d.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPS = 32
B, G, H, V = 16, 5, 4096, 128256
_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
kk = jax.random.PRNGKey(0)
wq = jax.jit(lambda k: (jax.random.bits(k, (H, V), jnp.uint8) >> 1
                        ).astype(jnp.int8))(kk)
scale = jnp.full((V,), 0.01, jnp.float32)
x3 = jax.jit(lambda k: jax.random.normal(k, (B, G, H), jnp.bfloat16))(kk)
print("ready", flush=True)


def timeit(label, fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:10s} {dt*1e3:8.2f} ms   {H*V/dt/1e9:6.0f} GB/s",
          flush=True)


@jax.jit
def f_3d(x, wq, scale):
    y = jax.lax.dot_general(x, wq, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.argmax(y * scale, axis=-1)


@jax.jit
def f_flat(x, wq, scale):
    y = jax.lax.dot_general(x.reshape(-1, H), wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.argmax(y * scale, axis=-1).reshape(x.shape[:-1])


timeit("dot3d", f_3d, x3, wq, scale)
timeit("dotflat", f_flat, x3, wq, scale)
