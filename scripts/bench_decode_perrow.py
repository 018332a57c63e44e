"""A/B the PER-ROW-slot decode step (the serving engine's shape) between
the shipped XLA scatter cache write and the fused Pallas attention+write
kernel (kernels/decode_attention.decode_attention_stacked_write).

The lockstep A/B (scripts/bench_decode_fused.py) showed fusion LOSES at
scalar slots (the scan-carried cache costs more than the RMW write saves);
per-row slots go through `.at[:, bidx, :, idx, :].set` — a batched scatter
XLA may or may not keep in place — so it gets its own measurement at the
serving flagship shape (8B int8, 8 slots, T=1728; 16 slots OOM-hangs the
tunnel: params 9.5 GB + 4.5 GB cache + scatter temps exceed the 16 GB chip).

    P2T_FUSED_CACHE_WRITE=1 python scripts/bench_decode_perrow.py fused
    python scripts/bench_decode_perrow.py split              (default dispatch)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import _init_quantized_random                    # noqa: E402
from prot2text_tpu.models.llama import LlamaConfig          # noqa: E402
from prot2text_tpu.models.decoder import decoder_decode_step  # noqa: E402

label = sys.argv[1] if len(sys.argv) > 1 else "?"
# tiny first dispatch: the tunnel wedge hits at FIRST dispatch (CLAUDE.md)
# and big first dispatches (the 8B init) appear to wedge far more often
_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print(f"{label}: warm", flush=True)
B, T, STEPS = 8, 1728, 32
cfg = LlamaConfig.llama_3_1_8b().core()
params = _init_quantized_random(cfg, bits=8)
L, Hkv, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim

rng = np.random.default_rng(0)
# cache is initialized ON DEVICE: a (L,B,Hkv,T,D) host array is ~7 GB of
# float64 and minutes of tunnel transfer (CLAUDE.md: host transfers are
# seconds per big array) — that is what made the first version of this
# probe blow through a 600 s timeout before ever compiling.
kk = jax.random.PRNGKey(1)
cache = {
    "k": jax.jit(lambda k: jax.random.normal(
        k, (L, B, Hkv, T, D), jnp.bfloat16) * 0.02)(kk),
    "v": jax.jit(lambda k: jax.random.normal(
        k, (L, B, Hkv, T, D), jnp.bfloat16) * 0.02)(jax.random.fold_in(kk, 1)),
}
lengths0 = jnp.asarray(rng.integers(T // 4, T - STEPS - 1, (B,)), jnp.int32)
jax.block_until_ready(cache["v"])
print(f"{label}: cache ready", flush=True)


# params MUST be a jit argument: closing over them captures ~7 GB of
# CONSTANTS into the lowered module (jax warns "large amount of constants
# captured"), and the remote compile of that module never finishes — that,
# not the tunnel, was this probe's original multi-attempt "hang".
@functools.partial(jax.jit, donate_argnums=(1,))
def step(params, state):
    cache, lengths, x = state
    tpos = jnp.arange(T)[None, :]
    bias = jnp.where(tpos < lengths[:, None], 0.0, -jnp.inf
                     ).astype(jnp.float32).reshape(B, 1, 1, T)
    h, cache = decoder_decode_step(
        cfg, params, token_embeds=x, bias_old=bias,
        positions=lengths[:, None], kv_cache=cache, cache_index=lengths)
    return (cache, lengths + 1, h.astype(x.dtype))


x0 = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)), jnp.bfloat16)
state = (cache, lengths0, x0)
state = step(params, state)
np.asarray(state[2])     # block_until_ready does NOT reliably block
print(f"{label}: compiled", flush=True)   # through the remote tunnel —
t0 = time.perf_counter()                  # force a host transfer instead
for _ in range(STEPS):
    state = step(params, state)
h_host = np.asarray(state[2])
dt = (time.perf_counter() - t0) / STEPS
print(f"{label} perrow B={B} T={T}: {dt*1e3:7.2f} ms/step  "
      f"{B/dt:7.1f} tok/s  h00={float(h_host[0, 0, 0]):.4f}", flush=True)
