"""Measure XLA vs Pallas flash(-masked) attention on the real chip across
the production shapes, fwd and fwd+bwd. Decides the `attn_impl=auto`
dispatch thresholds (VERDICT round-1 item #6).

Shapes:
  * encoder (bidirectional, right-padded): ESM2-3B-like  B8 H40 S1024 D64,
    ESMC-600m-like B8 H18 S1024 D64
  * decoder prefill/train (causal): Llama-1B-like B4 H32 S2048 D64,
    B8 H16 S512 D64 (contrastive text tower)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from prot2text_tpu.kernels.attention import _xla_attention  # noqa: E402
from prot2text_tpu.kernels.flash_attention import (  # noqa: E402
    flash_attention_masked, flash_attention_tpu,
)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def bias_from(mask, causal, dtype=jnp.float32):
    B, S = mask.shape
    neg = jnp.finfo(dtype).min
    ok = mask[:, None, None, :].astype(bool)
    if causal:
        idx = jnp.arange(S)
        ok = jnp.logical_and(ok, (idx[None, :] <= idx[:, None])[None, None])
    return jnp.where(ok, 0.0, neg).astype(dtype)


def run_shape(tag, B, H, S, D, causal, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), dtype) * 0.1
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), dtype) * 0.1
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), dtype) * 0.1
    lens = np.full((B,), S, np.int32)
    lens[::2] = max(S - 37, 1)
    mask = (np.arange(S)[None] < lens[:, None]).astype(np.int32)
    kv_start = jnp.zeros((B,), jnp.int32)
    kv_len = jnp.asarray(lens)
    bias = bias_from(jnp.asarray(mask), causal)

    xla_f = jax.jit(lambda q, k, v, b: _xla_attention(q, k, v, b))
    fl_bias = jax.jit(lambda q, k, v, b: flash_attention_tpu(q, k, v, b))
    fl_mask = jax.jit(lambda q, k, v, s, l: flash_attention_masked(
        q, k, v, s, l, causal=causal))

    r = {}
    r["xla_fwd"] = timeit(xla_f, q, k, v, bias)
    try:
        r["flash_bias_fwd"] = timeit(fl_bias, q, k, v, bias)
    except Exception as e:
        r["flash_bias_fwd"] = f"ERR {type(e).__name__}"
    try:
        r["flash_mask_fwd"] = timeit(fl_mask, q, k, v, kv_start, kv_len)
    except Exception as e:
        r["flash_mask_fwd"] = f"ERR {e}"

    # fwd+bwd (training path)
    def loss_xla(q, k, v):
        return _xla_attention(q, k, v, bias).astype(jnp.float32).sum()

    def loss_fl(q, k, v):
        return flash_attention_masked(
            q, k, v, kv_start, kv_len, causal=causal
        ).astype(jnp.float32).sum()

    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
    g_fl = jax.jit(jax.grad(loss_fl, argnums=(0, 1, 2)))
    r["xla_fb"] = timeit(g_xla, q, k, v)
    try:
        r["flash_mask_fb"] = timeit(g_fl, q, k, v)
    except Exception as e:
        r["flash_mask_fb"] = f"ERR {e}"

    def fmt(x):
        return f"{x:7.2f}" if isinstance(x, float) else str(x)

    print(f"{tag:28s} B{B} H{H} S{S} D{D} causal={int(causal)} | "
          + " ".join(f"{k}={fmt(v)}ms" for k, v in r.items()), flush=True)
    return r


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run_shape("contrastive_text_S512", 8, 16, 512, 64, causal=True)
    run_shape("esmc600m_enc_S1024", 8, 18, 1024, 64, causal=False)
    run_shape("esm2_3b_enc_S1024", 8, 40, 1024, 64, causal=False)
    run_shape("llama1b_prefill_S2048", 4, 32, 2048, 64, causal=True)
    run_shape("qwen14b_sft_S2048", 2, 40, 2048, 128, causal=True)
