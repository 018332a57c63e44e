"""Per-pallas_call overhead probe: N back-to-back launches of a small
int4 matmul inside ONE jit (scan over stacked weights), vs the same total
bytes in 1/4 as many 4x-bigger launches.  If per-launch overhead is
significant, the many-small variant is much slower per byte."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.kernels.quant_matmul import quant_matmul_int4  # noqa:E402

R, K = 16, 5120
K2 = K // 2


def timed(fn, label, total_bytes, calls):
    r = fn(); np.asarray(r[:1, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
    np.asarray(r[:1, :1])
    dt = (time.perf_counter() - t0) / 3
    print(f"{label}: {dt*1e3:8.2f} ms  {total_bytes/dt/1e9:7.1f} GB/s"
          f"  ({dt/calls*1e6:6.1f} us/call)", flush=True)


def run_case(n_calls, n_out):
    wp = jax.random.randint(jax.random.PRNGKey(0), (n_calls, K2, n_out),
                            -128, 128, jnp.int8)
    sc = jnp.full((n_calls, 1, n_out), 0.01, jnp.float32)

    @jax.jit
    def run(x, wp, sc):
        def body(c, lw):
            y = quant_matmul_int4(x, lw[0], lw[1])
            return c + y.sum(), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (wp, sc))
        return c.reshape(1, 1)

    x0 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (R, K), jnp.bfloat16))()
    total = n_calls * K2 * n_out
    timed(lambda: run(x0, wp, sc),
          f"{n_calls:4d} calls x {K2 * n_out / 1e6:6.1f} MB", total, n_calls)


if __name__ == "__main__":
    run_case(280, 1024)    # 14B decode-step launch count, small N each
    run_case(70, 4096)     # same bytes, 4x fewer launches
    run_case(18, 16384)    # same bytes, 15x fewer launches
