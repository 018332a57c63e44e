"""On-chip microbench: streaming quantized matmul kernels vs XLA.

Decode-shaped chain: L layers of (H, M) + (M, H) weights, scanned, STEPS
repeats inside one jit (amortizes the remote-dispatch overhead, mimics the
decode loop's weight re-streaming).  Run on the real chip:

    python scripts/bench_quant_matmul.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prot2text_tpu.kernels.quant_matmul import (  # noqa: E402
    quant_matmul_int4, quant_matmul_int8,
)

B, H, M, L, STEPS = int(os.environ.get("PROBE_B", 16)), 4096, 14336, 4, 20


def timed(step, weights, label, bytes_per_step):
    @jax.jit
    def run(x, w):
        def outer(x, _):
            x, _ = jax.lax.scan(lambda c, lw: (step(c, lw), None), x, w)
            return x, None
        x, _ = jax.lax.scan(outer, x, None, length=STEPS)
        return x

    x0 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (B, H), jnp.bfloat16))()
    r = run(x0, weights); np.asarray(r[:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        r = run(x0, weights)
    np.asarray(r[:1, :1])
    dt = (time.perf_counter() - t0) / 3 / STEPS
    print(f"{label}: {dt*1e6:8.1f} us/step  {bytes_per_step/dt/1e9:7.1f} GB/s",
          flush=True)


@jax.jit
def make_i8():
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    return {"up": jax.random.randint(ks[0], (L, H, M), -100, 100, jnp.int8),
            "dn": jax.random.randint(ks[1], (L, M, H), -100, 100, jnp.int8),
            "su": jnp.full((L, 1, M), 0.01, jnp.float32),
            "sd": jnp.full((L, 1, H), 0.01, jnp.float32)}


@jax.jit
def make_i4():
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    return {"up": jax.random.randint(ks[0], (L, H // 2, M), -128, 127,
                                     jnp.int8),
            "dn": jax.random.randint(ks[1], (L, M // 2, H), -128, 127,
                                     jnp.int8),
            "su": jnp.full((L, 1, M), 0.01, jnp.float32),
            "sd": jnp.full((L, 1, H), 0.01, jnp.float32)}


def step_xla_i8(x, lw):
    y = jax.lax.dot_general(x, lw["up"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = (y * lw["su"]).astype(jnp.bfloat16)
    z = jax.lax.dot_general(y, lw["dn"], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (z * lw["sd"]).astype(jnp.bfloat16)


def step_pl_i8(bk, bn):
    def f(x, lw):
        y = quant_matmul_int8(x, lw["up"], lw["su"], block_k=bk, block_n=bn)
        return quant_matmul_int8(y, lw["dn"], lw["sd"], block_k=bk,
                                 block_n=bn)
    return f


def step_pl_i4(bk, bn):
    def f(x, lw):
        y = quant_matmul_int4(x, lw["up"], lw["su"], block_k=bk, block_n=bn)
        return quant_matmul_int4(y, lw["dn"], lw["sd"], block_k=bk,
                                 block_n=bn)
    return f


if __name__ == "__main__":
    w8 = make_i8()
    timed(step_xla_i8, w8, "xla  int8          ", L * 2 * H * M)
    for bk, bn in ((1024, 1024), (512, 2048), (1024, 2048), (2048, 1024),
                   (512, 512), (2048, 2048)):
        try:
            timed(step_pl_i8(bk, bn), w8, f"plas int8 {bk:4d}x{bn:4d}",
                  L * 2 * H * M)
        except Exception as e:
            print(f"plas int8 {bk}x{bn} failed: {type(e).__name__}",
                  flush=True)
    del w8
    w4 = make_i4()
    for bk, bn in ((1024, 1024), (512, 2048), (1024, 2048), (2048, 1024),
                   (2048, 2048)):
        try:
            timed(step_pl_i4(bk, bn), w4, f"plas int4 {bk:4d}x{bn:4d}",
                  L * 2 * H * M // 2)
        except Exception as e:
            print(f"plas int4 {bk}x{bn} failed: {type(e).__name__}",
                  flush=True)
