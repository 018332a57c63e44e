"""Decompose the 8B B=128 decode step: weights matmuls vs attention-over-
cache vs cache write vs the full shipped decoder_decode_step.  All amortized
over STEPS inside one jit.  Every run_* returns SMALL arrays only — the
remote-execution tunnel makes host transfers of big buffers look like
kernel time (a full-cache np.asarray costs ~60s)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, T, L = 128, 192, 32
H, Hq, Hkv, D, M, V = 4096, 32, 8, 128, 14336, 128256
STEPS = 10


def timeit(fn, label, bytes_per_step=None, steps=STEPS):
    r = fn(); jax.tree_util.tree_map(np.asarray, r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
    jax.tree_util.tree_map(np.asarray, r)
    dt = (time.perf_counter() - t0) / 3 / steps
    extra = f"  {bytes_per_step/dt/1e9:7.1f} GB/s" if bytes_per_step else ""
    print(f"{label}: {dt*1e3:8.2f} ms/step{extra}", flush=True)


# 1. weights-only: per layer q,k,v,o,gate,up,down int8 matmuls
def make_w():
    k = jax.random.PRNGKey(0)
    r = jax.jit(lambda kk, shp: jax.random.bits(
        kk, shp, jnp.uint8).astype(jnp.int8), static_argnums=1)
    ks = jax.random.split(k, 8)
    shapes = {
        "q": (L, H, Hq * D), "k": (L, H, Hkv * D),
        "v": (L, H, Hkv * D), "o": (L, Hq * D, H),
        "g": (L, H, M), "u": (L, H, M), "d": (L, M, H),
        "lm": (H, V),
    }
    return {name: jax.block_until_ready(r(kk, shp))
            for (name, shp), kk in zip(shapes.items(), ks)}


w = make_w()
wbytes = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(w))
print("weight bytes:", wbytes / 1e9, "GB", flush=True)


def mm(x, ww):
    return jax.lax.dot_general(x, ww, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16) * 0.01


def weights_step(x, lw):
    q = mm(x, lw["q"]); kk = mm(x, lw["k"]); v = mm(x, lw["v"])
    x = x + mm(q, lw["o"])[:, :H]
    g = mm(x, lw["g"]); u = mm(x, lw["u"])
    x = x + mm((g * u).astype(jnp.bfloat16), lw["d"])
    return (x + kk.sum() * 0 + v.sum() * 0).astype(jnp.bfloat16)


@jax.jit
def run_weights(x, w):
    def outer(x, _):
        def inner(c, lw):
            return weights_step(c, {k: lw[k] for k in
                                    ("q", "k", "v", "o", "g", "u", "d")}), None
        x, _ = jax.lax.scan(inner, x, {k: w[k] for k in
                                       ("q", "k", "v", "o", "g", "u", "d")})
        logits = jax.lax.dot_general(x, w["lm"], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        x = (x + logits.max(axis=-1, keepdims=True)[:, :1] * 0
             ).astype(jnp.bfloat16)
        return x, None
    x, _ = jax.lax.scan(outer, x, None, length=STEPS)
    return x[:1, :1]


x0 = jax.jit(lambda: jax.random.normal(
    jax.random.PRNGKey(1), (B, H), jnp.bfloat16))()
timeit(lambda: run_weights(x0, w), "weights+lm_head  ", wbytes)
del w

# 2. attention-only over bktd cache: (L,B,Hkv,T,D)
@jax.jit
def make_cache():
    k = jax.random.PRNGKey(2)
    ck = jax.random.normal(k, (L, B, Hkv, T, D), jnp.bfloat16)
    return ck, ck + 1


ck, cv = make_cache()
cbytes = 2 * L * B * Hkv * T * D * 2
print("cache bytes:", cbytes / 1e9, "GB", flush=True)
rep = Hq // Hkv


def attn_step(x, xs):
    lk, lv = xs       # (B,Hkv,T,D)
    qg = x.reshape(B, Hkv, rep, D)
    logits = jnp.einsum("bkrd,bktd->bkrt", qg, lk,
                        preferred_element_type=jnp.float32)
    wgt = jax.nn.softmax(logits, axis=-1)
    a = jnp.einsum("bkrt,bktd->bkrd", wgt.astype(lv.dtype), lv,
                   preferred_element_type=jnp.float32)
    return (x + a.reshape(B, Hq * D)[:, :Hkv * rep * D] * 0.001
            ).astype(jnp.bfloat16)


@jax.jit
def run_attn(x, ck, cv):
    def outer(x, _):
        x, _ = jax.lax.scan(lambda c, xs: (attn_step(c, xs), None), x,
                            (ck, cv))
        return x, None
    x, _ = jax.lax.scan(outer, x, None, length=STEPS)
    return x[:1, :1]


xq = jax.jit(lambda: jax.random.normal(
    jax.random.PRNGKey(3), (B, Hq * D), jnp.bfloat16))()
timeit(lambda: run_attn(xq, ck, cv), "attention (cache)", cbytes)

# 3. cache write kernel per step — return a tiny on-device reduction that
# depends on the final caches so the loop cannot be DCE'd
from prot2text_tpu.kernels.cache_update import (           # noqa: E402
    cache_slot_write_bkt, supports_inplace_bkt)

print("supports bkt:", supports_inplace_bkt((L, B, Hkv, T, D)), flush=True)

WSTEPS = 50


@jax.jit
def run_write(ck, cv, new):
    def body(i, carry):
        ck, cv = carry
        ck = cache_slot_write_bkt(ck, new, i % T)
        cv = cache_slot_write_bkt(cv, new + 1, (i + 7) % T)
        return ck, cv
    ck, cv = jax.lax.fori_loop(0, WSTEPS, body, (ck, cv))
    return ck[0, :1, 0, 0, :1] + cv[0, :1, 0, 0, :1]


new = jax.jit(lambda: jax.random.normal(
    jax.random.PRNGKey(4), (L, B, Hkv, D), jnp.bfloat16))()
timeit(lambda: run_write(ck, cv, new), "cache write (x2) ", steps=WSTEPS)
del ck, cv

# 4. full shipped decode loop at the same scale: generate() on the 8B int8
# config (the bench.py configuration, B=128) but timed per decode step
from bench import _init_quantized_random                    # noqa: E402
from prot2text_tpu.models.llama import LlamaConfig          # noqa: E402
from prot2text_tpu.infer.generate import (                  # noqa: E402
    GenerationConfig, generate)

cfg = LlamaConfig.llama_3_1_8b().core()
params = _init_quantized_random(cfg, bits=8)
rng = np.random.default_rng(0)
P, NEW = 128, 64
emb = jnp.asarray(rng.standard_normal((B, P, cfg.hidden_size)),
                  jnp.bfloat16)
mask = jnp.ones((B, P), jnp.int32)
gen_cfg = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1,
                           pad_token_id=0)


def run_full(new_tokens):
    gc = GenerationConfig(max_new_tokens=new_tokens, eos_token_id=-1,
                          pad_token_id=0)
    return np.asarray(generate(
        cfg, params, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=gc, attn_impl="xla", cache_dtype=jnp.bfloat16))


# two-point measurement — a single generate() call conflates the prefill
# (~1.5 s at this scale) with the decode loop; round-3 lesson: the old
# one-point number (43.8 ms/step) overstated the true 19.6 ms/step
for n in (NEW // 2, NEW):
    run_full(n)
t = {}
for n in (NEW // 2, NEW):
    t0 = time.perf_counter()
    for _ in range(3):
        run_full(n)
    t[n] = (time.perf_counter() - t0) / 3
dt = (t[NEW] - t[NEW // 2]) / (NEW - NEW // 2)
print(f"full decode step : {dt*1e3:8.2f} ms/step (two-point; prefill "
      f"{max(t[NEW//2] - NEW//2*dt, 0):.2f} s)", flush=True)
