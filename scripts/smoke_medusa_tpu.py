"""On-chip smoke of learned-draft (Medusa) serving, exercising the
TPU-only paths the CPU tests cannot reach (the fused chunk-verify kernel
+ the last_hidden carry under buffer donation).

Guarantee checked: the two spec draft sources (medusa / n-gram) run the
SAME verify numerics, so their streams must be BIT-IDENTICAL.  Spec vs
the plain single-token engine is exact only up to bf16 accumulation
order: the G-row chunk forward tiles its matmuls differently, and at a
0-1-ulp top-2 logit tie the argmax legitimately flips.  This smoke's
random-weight tiny model is pathologically tied — probe_spec_ties.py
measured the diverging positions at top-2 gaps of 0.0-0.0156 in bf16
logits (= 0-2 ulp; the plain stream itself oscillates between the same
two tokens) — so plain-vs-spec divergence is REPORTED, not asserted;
tests/test_serving.py pins exact equality on CPU f32 where both paths
share numerics.

    python scripts/smoke_medusa_tpu.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from prot2text_tpu.infer.serving import ContinuousBatcher       # noqa: E402
from prot2text_tpu.models.llama import LlamaConfig              # noqa: E402
from prot2text_tpu.models.medusa import (                       # noqa: E402
    MedusaConfig, init_medusa_params,
)
from bench import _init_quantized_random                        # noqa: E402

_w = jnp.ones((8, 8), jnp.bfloat16)
jax.block_until_ready(_w @ _w)
print("warm", flush=True)

cfg = LlamaConfig(vocab_size=1024, hidden_size=512, num_layers=4,
                  num_heads=4, num_kv_heads=4, intermediate_size=1024,
                  rope_theta=10000.0, rope_scaling=None,
                  tie_word_embeddings=False).core()
assert cfg.head_dim == 128      # D=128: the fused-kernel flagship layout
params = _init_quantized_random(cfg, bits=8)
rng = np.random.default_rng(0)
reqs = [(i, jnp.asarray(rng.standard_normal(
    (128, cfg.hidden_size)).astype(np.float32), jnp.bfloat16), 24)
    for i in range(6)]


def serve(medusa=None, plt=0, kv_bits=8):
    eng = ContinuousBatcher(cfg, params, max_slots=4, max_len=256,
                            prompt_pad=128, eos_token_id=-1, sync_every=8,
                            kv_bits=kv_bits, medusa_params=medusa,
                            prompt_lookup_tokens=plt)
    if medusa is not None and kv_bits is not None:
        assert eng._spec_fused, "fused verify should engage on-chip"
    for rid, e, b in reqs:
        eng.submit(rid, e, max_new_tokens=b, prompt_len=100 + rid)
    t0 = time.perf_counter()
    out = {k: list(v) for k, v in eng.run()}
    return out, eng.steps, time.perf_counter() - t0


def diff(name, a, b):
    bad = 0
    for k in a:
        if a[k] != b[k]:
            bad += 1
            i = next(i for i, (x, y) in enumerate(zip(a[k], b[k]))
                     if x != y)
            print(f"  {name} req {k}: first divergence at token {i} "
                  f"({a[k][i]} vs {b[k][i]}), lens {len(a[k])}/{len(b[k])}")
    return bad


plain, s0, t_p = serve()
med = init_medusa_params(MedusaConfig(cfg.hidden_size, 3),
                         jax.random.PRNGKey(1), scale=0.2)
med = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), med)
spec, s1, t_m = serve(medusa=med)
lookup, s2, t_l = serve(plt=3)
n_med = diff("medusa", plain, spec)
n_ngr = diff("ngram", plain, lookup)
# the two spec draft sources run the SAME verify numerics — they must
# agree with each other bit-exactly even where they drift from plain
assert spec == lookup, "medusa and ngram spec streams disagree"
print(f"kv8: plain {s0} steps | medusa {s1} rounds ({n_med} diverged) | "
      f"ngram {s2} rounds ({n_ngr} diverged)", flush=True)

# bf16-KV arm (XLA verify, no int8 quantization): divergences here have
# the same near-tie cause — see the module docstring
plain16, _, _ = serve(kv_bits=None)
spec16, _, _ = serve(medusa=med, kv_bits=None)
lookup16, _, _ = serve(plt=3, kv_bits=None)
assert spec16 == lookup16, "bf16 medusa and ngram spec streams disagree"
n16 = diff("bf16 medusa", plain16, spec16) + diff("bf16 ngram", plain16,
                                                  lookup16)
print(f"bf16 KV: {n16} diverged (near-tie flips only)", flush=True)
print("ok: spec draft sources bit-identical on both cache dtypes",
      flush=True)
