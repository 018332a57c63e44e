"""Isolate the ~24 ms/step gap between decode components (~20 ms) and the
full shipped decode step (43.8 ms) at 8B int8 B=128 (scripts/
bench_decode_decomp.py evidence).

Variants, all timed per decode step:
  F  full shipped generate()                      (baseline, 43.8 ms)
  R  while_loop decode, WRITE DISCARDED           (read-only: carry keeps the
     old cache; XLA can DCE the slot write)       → isolates write+aliasing
  H  host-driven: ONE jitted decode step with the whole state DONATED,
     called NEW times back-to-back (async dispatch, no per-step sync)
  C  chunked: jitted scan of CH steps with state donated per chunk
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax, jax.numpy as jnp
import functools

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import _init_quantized_random                    # noqa: E402
from prot2text_tpu.models.llama import LlamaConfig          # noqa: E402
from prot2text_tpu.models.decoder import (                  # noqa: E402
    decoder_decode_step, decoder_logits)
from prot2text_tpu.infer.generate import (                  # noqa: E402
    GenerationConfig, _bias_from_kv_mask, generate)
from prot2text_tpu.infer.kvcache import init_kv_cache       # noqa: E402

B, P, NEW = 128, 128, 32
cfg = LlamaConfig.llama_3_1_8b().core()
params = _init_quantized_random(cfg, bits=8)
rng = np.random.default_rng(0)
emb = jnp.asarray(rng.standard_normal((B, P, cfg.hidden_size)), jnp.bfloat16)
mask = jnp.ones((B, P), jnp.int32)
T = P + NEW


def timeit(fn, label, steps):
    r = fn(); jax.tree_util.tree_map(np.asarray, r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
    jax.tree_util.tree_map(np.asarray, r)
    dt = (time.perf_counter() - t0) / 3 / steps
    print(f"{label}: {dt*1e3:8.2f} ms/step", flush=True)


# --- F: shipped generate, two-point to remove prefill ---------------------
gen_lo = GenerationConfig(max_new_tokens=NEW // 2, eos_token_id=-1,
                          pad_token_id=0)
gen_hi = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1, pad_token_id=0)


def run_gen(gc):
    return np.asarray(generate(cfg, params, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gc,
                               attn_impl="xla", cache_dtype=jnp.bfloat16))


for gc in (gen_lo, gen_hi):
    run_gen(gc)
t0 = time.perf_counter()
for _ in range(3):
    run_gen(gen_lo)
t_lo = (time.perf_counter() - t0) / 3
t0 = time.perf_counter()
for _ in range(3):
    run_gen(gen_hi)
t_hi = (time.perf_counter() - t0) / 3
print(f"F shipped generate  : {(t_hi-t_lo)/(NEW-NEW//2)*1e3:8.2f} ms/step",
      flush=True)


# shared tiny prefill state (random cache; values don't matter for timing)
@jax.jit
def mk_state():
    cache = init_kv_cache(cfg, B, T, jnp.bfloat16)
    kv_mask = jnp.concatenate(
        [jnp.ones((B, P), jnp.int32), jnp.zeros((B, NEW), jnp.int32)], axis=1)
    tok = jnp.full((B,), 17, jnp.int32)
    return cache["k"], cache["v"], kv_mask, tok


def body_step(ck, cv, kv_mask, tok, t, *, write=True):
    embt = params["embed_tokens"][tok][:, None, :].astype(jnp.bfloat16)
    bias = _bias_from_kv_mask(kv_mask, 1)
    pos = jnp.full((B, 1), P, jnp.int32) + t
    h, cache = decoder_decode_step(
        cfg, params, token_embeds=embt, bias_old=bias, positions=pos,
        kv_cache={"k": ck, "v": cv}, cache_index=P + t)
    if write:
        ck, cv = cache["k"], cache["v"]
    kv_mask = jax.lax.dynamic_update_slice(
        kv_mask, jnp.ones((B, 1), jnp.int32), (0, P + t))
    logits = decoder_logits(cfg, params, h)[:, 0]
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return ck, cv, kv_mask, tok


# --- R: while_loop, write discarded ---------------------------------------
@functools.partial(jax.jit, static_argnames=("write",))
def run_while(ck, cv, kv_mask, tok, *, write=True):
    def body(state):
        t, ck, cv, kv_mask, tok = state
        ck, cv, kv_mask, tok = body_step(ck, cv, kv_mask, tok, t, write=write)
        return (t + 1, ck, cv, kv_mask, tok)

    def cond(state):
        return state[0] < NEW

    _, ck, cv, kv_mask, tok = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), ck, cv, kv_mask, tok))
    return tok


st = mk_state()
timeit(lambda: run_while(*st, write=False), "R while, no write   ", NEW)
timeit(lambda: run_while(*st, write=True), "W while, with write ", NEW)


# --- H: host-driven donated single step -----------------------------------
@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def one_step(ck, cv, kv_mask, tok, t):
    return body_step(ck, cv, kv_mask, tok, t)


def run_host():
    ck, cv, kv_mask, tok = mk_state()
    for t in range(NEW):
        ck, cv, kv_mask, tok = one_step(ck, cv, kv_mask, tok,
                                        jnp.asarray(t))
    return np.asarray(tok)


timeit(run_host, "H host-driven donate", NEW)


# --- C: chunked scan with donated state -----------------------------------
CH = 8


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def chunk_step(ck, cv, kv_mask, tok, t0):
    def body(carry, i):
        ck, cv, kv_mask, tok = carry
        ck, cv, kv_mask, tok = body_step(ck, cv, kv_mask, tok, t0 + i)
        return (ck, cv, kv_mask, tok), None

    (ck, cv, kv_mask, tok), _ = jax.lax.scan(
        body, (ck, cv, kv_mask, tok), jnp.arange(CH))
    return ck, cv, kv_mask, tok


def run_chunks():
    ck, cv, kv_mask, tok = mk_state()
    for c in range(NEW // CH):
        ck, cv, kv_mask, tok = chunk_step(ck, cv, kv_mask, tok,
                                          jnp.asarray(c * CH))
    return np.asarray(tok)


timeit(run_chunks, "C chunked scan      ", NEW)
