"""Confirm the smoke_medusa_tpu.py spec-vs-plain divergences are bf16
near-tie argmax flips, not logic bugs: decode the diverging requests with
the plain lockstep generate() path on TPU bf16 and print the top-2 logit
gap at every emitted token.  A logic bug (wrong position/mask in the
chunk verify) would show large-gap flips; numeric-order flips happen only
where the gap is within bf16 noise of the logit scale.

    python scripts/probe_spec_ties.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.models.llama import LlamaConfig                 # noqa: E402
from prot2text_tpu.models.decoder import (                         # noqa: E402
    decoder_decode_step, decoder_forward, decoder_logits,
)
from prot2text_tpu.infer.generate import _prefill_bias             # noqa: E402
from prot2text_tpu.infer.kvcache import init_kv_cache              # noqa: E402
from bench import _init_quantized_random                           # noqa: E402

_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)

cfg = LlamaConfig(vocab_size=1024, hidden_size=512, num_layers=4,
                  num_heads=4, num_kv_heads=4, intermediate_size=1024,
                  rope_theta=10000.0, rope_scaling=None,
                  tie_word_embeddings=False).core()
params = _init_quantized_random(cfg, bits=8)
rng = np.random.default_rng(0)
# same prompts as smoke_medusa_tpu.py, requests 2..4 (the diverging ones)
prompts = []
for i in range(6):
    e = jnp.asarray(rng.standard_normal(
        (128, cfg.hidden_size)).astype(np.float32), jnp.bfloat16)
    prompts.append((e, 100 + i))

B = 3
P = 128
emb = jnp.stack([prompts[i][0] for i in (2, 3, 4)])
mask = np.zeros((B, P), np.int32)
for r, i in enumerate((2, 3, 4)):
    mask[r, P - prompts[i][1]:] = 1
mask = jnp.asarray(mask)

T = P + 32
cache = init_kv_cache(cfg, B, T, jnp.bfloat16, kv_bits=8)
positions = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, None).astype(jnp.int32)
bias = _prefill_bias(mask, T)
h, cache = decoder_forward(cfg, params, inputs_embeds=emb, bias=bias,
                           positions=positions, kv_cache=cache,
                           cache_index=0)
logits = decoder_logits(cfg, params, h[:, -1:])[:, 0]
kv_mask = jnp.concatenate([mask, jnp.zeros((B, T - P), jnp.int32)], axis=1)
pos = positions[:, -1]

rows = []
tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
for t in range(24):
    top2 = jax.lax.top_k(logits, 2)[0]
    gap = np.asarray(top2[:, 0] - top2[:, 1], np.float32)
    scale = np.asarray(jnp.abs(logits).max(axis=-1), np.float32)
    rows.append((t, np.asarray(tok), gap, gap / scale))
    embt = params["embed_tokens"][tok][:, None, :].astype(jnp.bfloat16)
    neg = jnp.finfo(jnp.float32).min
    b1 = jnp.where(kv_mask[:, None, None, :] > 0, 0.0, neg)
    h, cache = decoder_decode_step(
        cfg, params, token_embeds=embt, bias_old=b1,
        positions=(pos + 1)[:, None], kv_cache=cache,
        cache_index=jnp.full((B,), P + t, jnp.int32))
    kv_mask = kv_mask.at[:, P + t].set(1)
    pos = pos + 1
    logits = decoder_logits(cfg, params, h)[:, 0]
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

# smoke divergence points: (row 0 = req2, t=11/19), (row 1 = req3, t=7),
# (row 2 = req4, t=1/2)
print("t | tok(req2,3,4) | top2 gap | gap/|logit|max")
for t, tk, gap, rel in rows:
    mark = " <-- kv8/bf16 flip" if t in (1, 2, 7, 11, 19) else ""
    print(f"{t:3d} {tk} {np.array2string(gap, precision=4)} "
          f"{np.array2string(rel, precision=5)}{mark}", flush=True)
