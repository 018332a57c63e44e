"""Isolate the spec-verify round's fixed ~18.7 ms floor (bench_spec_floor
showed verify(G=1) == verify(G=5) and a tiny-T chunk forward costs MORE
than a full single-token round): is it the weight matmuls at chunk shapes,
or the chunk-verify kernel's (B, Hkv, 2)-grid overhead?

    python scripts/bench_spec_weights.py

Pieces (all scan over the 32 layers of the 8B int8 flagship):
  w16 / w80     six projections only, at 16 vs 80 activation rows
  kT1920 / kT64 the verify kernel only (no projections), full vs tiny T
  k1T1920       the single-token fused kernel only, full T (reference)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import _init_quantized_random                      # noqa: E402
from prot2text_tpu.models.llama import LlamaConfig            # noqa: E402
from prot2text_tpu.models.decoder import _stacked_proj        # noqa: E402
from prot2text_tpu.infer.kvcache import init_kv_cache         # noqa: E402
from prot2text_tpu.kernels.decode_attention import (          # noqa: E402
    decode_attention_stacked_verify_qc, decode_attention_stacked_write_q,
)

REPS = 16
B, G = 16, 5
_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)

cfg = LlamaConfig.llama_3_1_8b().core()
params = _init_quantized_random(cfg, bits=8)
L, H, Hkv, D = (cfg.num_layers, cfg.num_heads, cfg.num_kv_heads,
                cfg.head_dim)
rep = H // Hkv
kk = jax.random.PRNGKey(1)


def timeit(label, fn, st):
    st, out = fn(st)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, out = fn(st)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:10s} {dt*1e3:8.2f} ms", flush=True)
    return dt


# --- weight matmuls only ----------------------------------------------------
@functools.partial(jax.jit, static_argnames=("rows",))
def wloop(p, x, rows):
    layers = p["layers"]

    def block(x, li):
        def proj(name, x_):
            return _stacked_proj(layers, name, li, x_, True)

        q = proj("q_proj", x)
        k = proj("k_proj", x)
        v = proj("v_proj", x)
        a = proj("o_proj", q)
        g = proj("gate_proj", x)
        u = proj("up_proj", x)
        d = proj("down_proj", jax.nn.silu(g.astype(jnp.float32)
                                          ).astype(x.dtype) * u)
        # fold everything into the carry so nothing is DCE'd (a 0-multiply
        # would be constant-folded away)
        return x + a + d + (1e-6 * (k.sum() + v.sum())).astype(x.dtype), None

    x, _ = jax.lax.scan(block, x, jnp.arange(L))
    return x[:2, :8]


for rows in (16, 80):
    x0 = jax.jit(lambda k: jax.random.normal(
        k, (rows, cfg.hidden_size), jnp.bfloat16) * 0.02,
        static_argnums=())(kk)

    def f_w(st, x0=x0, rows=rows):
        return st, wloop(params, x0, rows)

    timeit(f"w{rows}", f_w, None)

# --- kernels only ------------------------------------------------------------
mk_i8 = jax.jit(lambda k, t: (jax.random.bits(
    k, (L, B, Hkv, t, D), jnp.uint8) >> 1).astype(jnp.int8),
    static_argnums=(1,))


def kernel_probe(T, label, single=False):
    kv = {
        "k": mk_i8(kk, T), "v": mk_i8(jax.random.fold_in(kk, 1), T),
        "k_scale": jnp.full((L, B, Hkv, T), 0.01, jnp.float32),
        "v_scale": jnp.full((L, B, Hkv, T), 0.01, jnp.float32),
    }
    kv_mask = jnp.asarray(np.broadcast_to(
        (np.arange(T) < max(1, T - 128)).astype(np.int32), (B, T)).copy())
    slots = jnp.full((B,), max(0, T - 96), jnp.int32)

    if single:
        qg = jax.jit(lambda k: jax.random.normal(
            k, (B, Hkv, rep, D), jnp.bfloat16))(kk)
        knq = jnp.ones((B, Hkv, D), jnp.float32)
        kns = jnp.ones((B, Hkv), jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def kloop(kv, qg):
            def block(carry, li):
                ck, cv, sk, sv = carry
                a, ck, cv, sk, sv = decode_attention_stacked_write_q(
                    qg, ck, cv, sk, sv, kv_mask, knq, knq, kns, kns,
                    li, slots)
                return (ck, cv, sk, sv), a[0, 0, 0, 0]

            (ck, cv, sk, sv), outs = jax.lax.scan(
                block, (kv["k"], kv["v"], kv["k_scale"], kv["v_scale"]),
                jnp.arange(L))
            return {"k": ck, "v": cv, "k_scale": sk, "v_scale": sv}, outs
    else:
        qg = jax.jit(lambda k: jax.random.normal(
            k, (B, Hkv, G * rep, D), jnp.bfloat16))(kk)
        knq = jnp.ones((B, Hkv, G, D), jnp.float32)
        kns = jnp.ones((B, Hkv, G), jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def kloop(kv, qg):
            def block(carry, li):
                ck, cv, sk, sv = carry
                a, ck, cv, sk, sv = decode_attention_stacked_verify_qc(
                    qg, ck, cv, sk, sv, kv_mask, knq, knq, kns, kns,
                    li, slots)
                return (ck, cv, sk, sv), a[0, 0, 0, 0]

            (ck, cv, sk, sv), outs = jax.lax.scan(
                block, (kv["k"], kv["v"], kv["k_scale"], kv["v_scale"]),
                jnp.arange(L))
            return {"k": ck, "v": cv, "k_scale": sk, "v_scale": sv}, outs

    def f_k(kv):
        kv, outs = kloop(kv, qg)
        return kv, outs

    timeit(label, f_k, kv)


kernel_probe(1920, "kT1920")
kernel_probe(64, "kT64")
kernel_probe(1920, "k1T1920", single=True)
