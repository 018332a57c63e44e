"""Decompose the speculative-serving verify round (TODO "spec-round cost
floor"): at the kv8 16-slot 8B flagship the fused verify round measures
~47 ms where a single-token decode round is ~19 ms.  Weights are re-read
either way, so the residual ~2x must sit in one of: the n-gram drafting
loop, the chunk-verify forward (Pallas kernel + G-row weight matmuls),
the (B, G, V) logits head, or the acceptance/history bookkeeping.  This
probe times each piece in isolation at the exact bench configuration
(bench.py bench_serving_flagship_spec: gamma=4, 16 slots, T=1920):

    python scripts/bench_spec_floor.py [reps]

Pieces:
  full      one _spec_rounds dispatch (rounds=1, fused kernel)
  draft     ngram_drafts alone (jitted)
  verify    decoder_verify_chunk alone (embed + chunk forward + write)
  logits    decoder_logits over the (B, G, H) chunk hidden states
  single    one single-token _decode_all round (the non-spec baseline)
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
from prot2text_tpu.models.decoder import (                    # noqa: E402
    decoder_logits, decoder_verify_chunk,
)
from prot2text_tpu.infer.kvcache import init_kv_cache         # noqa: E402
from prot2text_tpu.infer.serving import (                     # noqa: E402
    _decode_all, _spec_rounds, ngram_drafts,
)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
GAMMA, NGRAM = 4, 2
B, T, HWID = 16, 1920, 1350            # bench_serving_flagship_spec shapes
G = GAMMA + 1

_w = jnp.ones((8, 8), jnp.bfloat16)    # tiny first dispatch (tunnel wedge)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)

cfg = LlamaConfig.llama_3_1_8b().core()
params = _init_quantized_random(cfg, bits=8)
L, Hkv, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
rng = np.random.default_rng(0)

# mid-stream serving state: every slot active at a ragged length with a
# token history long enough for n-gram hits (repetitive stream = the
# high-acceptance regime the serving bench measures).  int8 cache values
# via random bits (randint materializes int32 4x intermediates, CLAUDE.md)
cache = init_kv_cache(cfg, B, T, jnp.bfloat16, kv_bits=8)
kk = jax.random.PRNGKey(1)
mk_i8 = jax.jit(lambda k: (jax.random.bits(
    k, (L, B, Hkv, T, D), jnp.uint8) >> 1).astype(jnp.int8))
cache["k"] = mk_i8(kk)
cache["v"] = mk_i8(jax.random.fold_in(kk, 1))
cache["k_scale"] = jnp.full((L, B, Hkv, T), 0.01, jnp.float32)
cache["v_scale"] = jnp.full((L, B, Hkv, T), 0.01, jnp.float32)
lengths0 = np.asarray(rng.integers(600, T - 256, (B,)), np.int32)
hist_np = np.full((B, HWID), -1, np.int32)
hlen = rng.integers(24, 80, (B,)).astype(np.int32)
for b in range(B):
    period = 3 + b % 5
    hist_np[b, :hlen[b]] = rng.integers(10, 50, period).repeat(
        hlen[b] // period + 1)[:hlen[b]]

state = {
    "k": cache["k"], "v": cache["v"],
    "k_scale": cache["k_scale"], "v_scale": cache["v_scale"],
    "kv_mask": jnp.asarray(
        (np.arange(T)[None, :] < lengths0[:, None]).astype(np.int32)),
    "pos": jnp.asarray(lengths0 - 1),
    "next_slot": jnp.asarray(lengths0),
    "active": jnp.ones((B,), bool),
    "last_tok": jnp.asarray(hist_np[np.arange(B), hlen - 1]),
    "budget": jnp.full((B,), 10_000, jnp.int32),
    "hist": jnp.asarray(hist_np),
    "hist_len": jnp.asarray(hlen),
}
np.asarray(state["kv_mask"][0, :4])
print("state ready", flush=True)


def timeit(label, fn, st):
    """fn: st -> (st, small_out).  Times REPS calls against ONE small host
    transfer (block_until_ready is unreliable through the tunnel)."""
    st, out = fn(st)                   # compile
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, out = fn(st)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:8s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def clone(drop_hist=False):
    out = {k: v + 0 if v.dtype != bool else jnp.logical_and(v, True)
           for k, v in state.items()}
    if drop_hist:
        del out["hist"], out["hist_len"]
    return out


# --- full spec round -------------------------------------------------------
def f_full(st):
    st, packed = _spec_rounds(cfg, st, params, eos_token_id=-1, gamma=GAMMA,
                              ngram=NGRAM, rounds=1, use_fused=True)
    return st, packed                  # packed: (3, 1, G, B) int32, tiny


t_full = timeit("full", f_full, clone())

# --- draft only ------------------------------------------------------------
dr = jax.jit(functools.partial(ngram_drafts, gamma=GAMMA, ngram=NGRAM))


def f_draft(st):
    h, hl = st
    return (h, hl), dr(h, hl)          # drafts: (B, gamma), tiny


t_draft = timeit("draft", f_draft, (state["hist"], state["hist_len"]))

drafts0 = dr(state["hist"], state["hist_len"])


# --- verify forward only (embed + chunk forward + aliased writes) ----------
@functools.partial(jax.jit, donate_argnums=(0,))
def vf(kv, drafts, last_tok, pos, next_slot, kv_mask, p):
    chunk = jnp.concatenate([last_tok[:, None], drafts], axis=1)
    emb = p["embed_tokens"][chunk].astype(jnp.bfloat16)
    poss = (pos + 1)[:, None] + jnp.arange(G)[None, :]
    h, kv = decoder_verify_chunk(
        cfg, p, token_embeds=emb, kv_mask01=kv_mask, positions=poss,
        kv_cache=kv, cache_index=next_slot)
    return kv, h[:, 0, :8]             # small out


def f_verify(kv):
    kv, out = vf(kv, drafts0, state["last_tok"], state["pos"],
                 state["next_slot"], state["kv_mask"], params)
    return kv, out


kv0 = {k: state[k] + 0 for k in ("k", "v", "k_scale", "v_scale")}
t_verify = timeit("verify", f_verify, kv0)

# --- logits head over the chunk --------------------------------------------
h0 = jax.jit(lambda k: jax.random.normal(
    k, (B, G, cfg.hidden_size), jnp.bfloat16))(kk)
# params must be an ARGUMENT (closing over them captures GBs of constants
# into the lowered module — the remote compile rejects/never finishes)
lg = jax.jit(lambda p, h: decoder_logits(cfg, p, h)[:, :, :8])


def f_logits(st):
    return None, lg(params, h0)


t_logits = timeit("logits", f_logits, None)

# --- G-scaling isolation ----------------------------------------------------
# verify at G=1 (same cache reads, 1/5 the chunk rows): separates the
# attention/cache streaming (T-bound, G-invariant) from the G-row costs
@functools.partial(jax.jit, donate_argnums=(0,))
def vf1(kv, last_tok, pos, next_slot, kv_mask, p):
    emb = p["embed_tokens"][last_tok[:, None]].astype(jnp.bfloat16)
    poss = (pos + 1)[:, None]
    h, kv = decoder_verify_chunk(
        cfg, p, token_embeds=emb, kv_mask01=kv_mask, positions=poss,
        kv_cache=kv, cache_index=next_slot)
    return kv, h[:, 0, :8]


def f_verify1(kv):
    kv, out = vf1(kv, state["last_tok"], state["pos"], state["next_slot"],
                  state["kv_mask"], params)
    return kv, out


kv1 = {k: state[k] + 0 for k in ("k", "v", "k_scale", "v_scale")}
t_verify1 = timeit("verify1", f_verify1, kv1)

# weights-only proxy: the same G=5 chunk forward against a TINY (T=64)
# cache — attention/cache streaming ~vanishes, leaving the weight matmuls
# + per-layer glue at 5·B rows
cache_s = init_kv_cache(cfg, B, 64, jnp.bfloat16, kv_bits=8)
kv_mask_s = jnp.zeros((B, 64), jnp.int32)
zero_slot = jnp.zeros((B,), jnp.int32)


@functools.partial(jax.jit, donate_argnums=(0,))
def vfs(kv, drafts, last_tok, p):
    chunk = jnp.concatenate([last_tok[:, None], drafts], axis=1)
    emb = p["embed_tokens"][chunk].astype(jnp.bfloat16)
    poss = jnp.broadcast_to(jnp.arange(G)[None, :], (B, G))
    h, kv = decoder_verify_chunk(
        cfg, p, token_embeds=emb, kv_mask01=kv_mask_s, positions=poss,
        kv_cache=kv, cache_index=zero_slot)
    return kv, h[:, 0, :8]


def f_weights(kv):
    kv, out = vfs(kv, drafts0, state["last_tok"], params)
    return kv, out


t_weights = timeit("weightsG", f_weights, {k: cache_s[k] + 0 for k in cache_s})

# logits at G=1 (the single-token round's head cost)
h1 = h0[:, :1]
def f_logits1(st):
    return None, lg(params, h1)


t_logits1 = timeit("logits1", f_logits1, None)


# --- single-token round (non-spec baseline) --------------------------------
def f_single(st):
    st, packed = _decode_all(cfg, st, params, jax.random.PRNGKey(0),
                             eos_token_id=-1, chunk=1, gen_cfg=None)
    return st, packed


t_single = timeit("single", f_single, clone(drop_hist=True))

resid = t_full - t_draft - t_verify - t_logits
print(f"\nfull {t_full*1e3:.2f} = draft {t_draft*1e3:.2f} + verify "
      f"{t_verify*1e3:.2f} + logits {t_logits*1e3:.2f} + residual "
      f"{resid*1e3:.2f} ms   (single-token round: {t_single*1e3:.2f} ms)",
      flush=True)
