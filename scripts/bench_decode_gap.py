"""Bisect the gap between the component floor (~19.5 ms) and the full
shipped decode step (~44 ms) at 8B int8 B=128:
  a) decoder_decode_step alone in a fori_loop
  b) + decoder_logits + argmax
  c) + kv_mask/bias update + token buffer (= generate's body) in fori_loop
  d) full generate() (while_loop + prefill, amortized)
"""
import sys, time

WHICH = sys.argv[1] if len(sys.argv) > 1 else "abcd"

import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import _init_quantized_random
from prot2text_tpu.models.llama import LlamaConfig
from prot2text_tpu.models.decoder import decoder_decode_step, decoder_logits
from prot2text_tpu.infer.generate import (
    GenerationConfig, generate, _bias_from_kv_mask)
from prot2text_tpu.infer.kvcache import init_kv_cache

B, P, NEW = 128, 128, 64
cfg = LlamaConfig.llama_3_1_8b().core()
params = _init_quantized_random(cfg, bits=8)
T = P + NEW
cache = init_kv_cache(cfg, B, T, jnp.bfloat16)
print("cache layout:", {k: v.shape for k, v in cache.items()}, flush=True)

rng = np.random.default_rng(0)
emb1 = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)), jnp.bfloat16)
kv_mask0 = jnp.concatenate(
    [jnp.ones((B, P), jnp.int32), jnp.zeros((B, NEW), jnp.int32)], axis=1)
STEPS = 32


def timeit(fn, label, steps=STEPS):
    r = fn(); jax.tree_util.tree_map(np.asarray, r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
    jax.tree_util.tree_map(np.asarray, r)
    dt = (time.perf_counter() - t0) / 3 / steps
    print(f"{label}: {dt*1e3:8.2f} ms/step", flush=True)


@jax.jit
def run_a(params, cache, emb):
    bias = _bias_from_kv_mask(kv_mask0, 1)

    def body(t, carry):
        cache, h = carry
        pos = jnp.full((B, 1), P + t, jnp.int32)
        h, cache = decoder_decode_step(
            cfg, params, token_embeds=emb + h * 0, bias_old=bias,
            positions=pos, kv_cache=cache, cache_index=P + t)
        return cache, h

    cache, h = jax.lax.fori_loop(0, STEPS, body, (cache, emb))
    return h[:1, :, :1]


if "a" in WHICH:
    timeit(lambda: run_a(params, cache, emb1), "a) decode_step only      ")


@jax.jit
def run_b(params, cache, emb):
    bias = _bias_from_kv_mask(kv_mask0, 1)

    def body(t, carry):
        cache, tok = carry
        e = params["embed_tokens"][tok][:, None, :].astype(jnp.bfloat16)
        pos = jnp.full((B, 1), P + t, jnp.int32)
        h, cache = decoder_decode_step(
            cfg, params, token_embeds=e, bias_old=bias,
            positions=pos, kv_cache=cache, cache_index=P + t)
        logits = decoder_logits(cfg, params, h)[:, 0]
        return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    cache, tok = jax.lax.fori_loop(
        0, STEPS, body, (cache, jnp.zeros((B,), jnp.int32)))
    return tok[:1]


if "b" in WHICH:
    timeit(lambda: run_b(params, cache, emb1), "b) + embed+logits+argmax ")


@jax.jit
def run_c(params, cache, emb):
    tokens = jnp.zeros((B, NEW), jnp.int32)
    finished = jnp.zeros((B,), bool)

    def body(t, carry):
        cache, tokens, kv_mask, finished = carry
        prev = tokens[:, 0]
        e = params["embed_tokens"][prev][:, None, :].astype(jnp.bfloat16)
        pos = jnp.full((B, 1), P + t, jnp.int32)
        bias = _bias_from_kv_mask(kv_mask, 1)
        h, cache = decoder_decode_step(
            cfg, params, token_embeds=e, bias_old=bias,
            positions=pos, kv_cache=cache, cache_index=P + t)
        kv_mask = jax.lax.dynamic_update_slice(
            kv_mask, jnp.ones((B, 1), jnp.int32), (0, P + t))
        logits = decoder_logits(cfg, params, h)[:, 0]
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(finished, 0, tok)
        tokens = tokens.at[:, t % NEW].set(tok)
        finished = jnp.logical_or(finished, tok == -1)
        return cache, tokens, kv_mask, finished

    cache, tokens, _, _ = jax.lax.fori_loop(
        0, STEPS, body, (cache, tokens, kv_mask0, finished))
    return tokens[:1, :1]


if "c" in WHICH:
    timeit(lambda: run_c(params, cache, emb1), "c) + mask/buffer (fori)  ")

emb = jnp.asarray(rng.standard_normal((B, P, cfg.hidden_size)), jnp.bfloat16)
mask = jnp.ones((B, P), jnp.int32)
gen_cfg = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1, pad_token_id=0)


def run_full():
    return np.asarray(generate(
        cfg, params, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=gen_cfg, attn_impl="xla", cache_dtype=jnp.bfloat16))


if "d" in WHICH:
    timeit(run_full, "d) full generate (while) ", steps=NEW)
