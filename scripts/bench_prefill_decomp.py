"""Decompose the 14B-int4 PREFILL at the descriptions/hour shape
(B=40, S=544): matmul-only floor vs the full decoder_forward prefill under
each attention impl.  The desc-hour batch spends ~4.8 s in prefill
(scripts/bench_desc_step.py differencing) vs a ~2.9 s MXU-bound floor
(575 TFLOP bf16) — this probe locates the gap.

    python scripts/bench_prefill_decomp.py [B] [S]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import _init_quantized_random                 # noqa: E402
from prot2text_tpu.infer.generate import _prefill_bias   # noqa: E402
from prot2text_tpu.infer.kvcache import init_kv_cache    # noqa: E402
from prot2text_tpu.models.decoder import (               # noqa: E402
    contiguous_lengths, decoder_forward)
from prot2text_tpu.models.qwen3 import Qwen3Config       # noqa: E402
from prot2text_tpu.models.transformer import linear      # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
S = int(sys.argv[2]) if len(sys.argv) > 2 else 544
cfg = Qwen3Config.qwen3_14b().core()
print(f"[{time.strftime('%H:%M:%S')}] init params...", flush=True)
params = _init_quantized_random(cfg, bits=4)
print(f"[{time.strftime('%H:%M:%S')}] params ready", flush=True)
H = cfg.hidden_size
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((B * S, H)).astype(np.float32),
                 jnp.bfloat16)
mask = jnp.ones((B, S), jnp.int32)
emb = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32),
                  jnp.bfloat16)
layers = params["layers"]
NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
         "gate_proj", "up_proj", "down_proj")

# FLOPs of the 7 weight matmuls over B*S rows (what every prefill must pay)
# planes packing: int32 words hold 8 int4 weights; bytes packing: int8
# holds 2; int8 quant: 1 per byte (scales are f32, excluded)
n_w = sum(
    a.size * (8 if a.dtype == jnp.int32 else 2)
    for nm in NAMES
    for a in jax.tree_util.tree_leaves(layers[nm])
    if a.dtype in (jnp.int32, jnp.int8))
flops = 2.0 * n_w * B * S
print(f"B={B} S={S} rows={B*S}  weight-elements={n_w/1e9:.2f}B  "
      f"matmul FLOPs={flops/1e12:.0f} TF", flush=True)


def timeit(fn, label):
    r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:7.3f} s  {flops/dt/1e12:6.1f} eff TFLOP/s",
          flush=True)
    return dt


@jax.jit
def matmuls_only(x, layers):
    """The 7 per-layer weight matmuls at prefill row count, nothing else —
    same stacked-param scan structure as decoder_forward.  `layers` is an
    ARGUMENT (a closure would inline 6.6 GB of captured constants into the
    lowered module and the remote compile never finishes — CLAUDE.md)."""
    def body(h, li):
        lp = jax.tree_util.tree_map(lambda a: a[li], layers)
        q = linear(lp["q_proj"], h)
        k = linear(lp["k_proj"], h)
        v = linear(lp["v_proj"], h)
        o = linear(lp["o_proj"], q)
        g = linear(lp["gate_proj"], h)
        u = linear(lp["up_proj"], h)
        d = linear(lp["down_proj"], (g * u).astype(h.dtype))
        h = h + o.astype(h.dtype) + d.astype(h.dtype)
        h = h + (jnp.sum(k) + jnp.sum(v)).astype(h.dtype) * 0  # keep k, v
        return h * 0.5, None

    out, _ = jax.lax.scan(body, x, jnp.arange(cfg.num_layers))
    return out[0, :8]


def full_prefill(impl):
    T = S + 32
    cache = init_kv_cache(cfg, B, T, jnp.bfloat16, kv_bits=8)
    bias = _prefill_bias(mask, T)

    @functools.partial(jax.jit, static_argnames=("impl",))
    def go(params, emb, cache, bias, impl):
        h, cache = decoder_forward(
            cfg, params, inputs_embeds=emb, bias=bias,
            positions=jnp.broadcast_to(jnp.arange(S), (B, S)),
            kv_cache=cache, cache_index=0, attn_impl=impl,
            attn_lengths=contiguous_lengths(mask))
        return h[0, -1, :8]

    return lambda: go(params, emb, cache, bias, impl=impl)


timeit(lambda: matmuls_only(x0, layers), "matmul-only floor")
timeit(full_prefill("flash"), "full prefill attn=flash")
timeit(full_prefill("xla"), "full prefill attn=xla")
