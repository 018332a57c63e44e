"""On-chip A/B for the descriptions/hour north-star config
(bench.py bench_descriptions_per_hour): esmc_600m encoder + adapter +
Qwen3-14B int4 decoder, one 16 GB chip.

The decode step at 14B int4 is weights-streaming-bound (the full packed
weight set is re-read every step), so batch rows are nearly free until the
KV-cache reads catch up — the shipped metric uses B=8; this probe sweeps B
and the int8 KV cache to find the one-chip sweet spot.

    python scripts/bench_desc_hour.py 8       # current shipped config
    python scripts/bench_desc_hour.py 16
    python scripts/bench_desc_hour.py 16 kv8
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import _init_quantized_random                 # noqa: E402
from prot2text_tpu.infer.generate import (               # noqa: E402
    GenerationConfig, generate)
from prot2text_tpu.models.adapters import (              # noqa: E402
    ModalityAdapterConfig, init_modality_adapter_params, modality_adapter)
from prot2text_tpu.models.esmc import (                  # noqa: E402
    ESMCConfig, esmc_encode, init_esmc_params)
from prot2text_tpu.models.qwen3 import Qwen3Config       # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
kv_bits = 8 if "kv8" in sys.argv[2:] else None
# "auto": the S=544 prompt is NOT 128-tileable, so the prefill routes to
# the query-chunked XLA attention (kernels/attention._xla_attention_chunked)
# which bounds the fp32 scores transient; "xla" materializes the full
# (B, Hq, S, T) fp32 prefill scores — ~2.9 GB at B=40, the allocation
# that used to bound the sweep at B=32
ATTN = "xla" if "xla" in sys.argv[2:] else "auto"
PROT, NEW = 512, 256

enc_cfg = ESMCConfig.esmc_600m()
dec_cfg = Qwen3Config.qwen3_14b().core()
enc_params = init_esmc_params(enc_cfg, jax.random.PRNGKey(0), jnp.bfloat16)
ad_cfg = ModalityAdapterConfig(enc_cfg.d_model, 2048, dec_cfg.hidden_size)
ad_params = init_modality_adapter_params(ad_cfg, jax.random.PRNGKey(1),
                                         jnp.bfloat16)
dec_params = _init_quantized_random(dec_cfg, bits=4)
rng = np.random.default_rng(0)
prot_ids = jnp.asarray(rng.integers(4, 24, (B, PROT)), jnp.int32)
prot_mask = jnp.ones((B, PROT), jnp.int32)
text_emb = jnp.asarray(rng.standard_normal((B, 32, dec_cfg.hidden_size)),
                       jnp.bfloat16)
gen_cfg = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1,
                           pad_token_id=0)


def run():
    enc = esmc_encode(enc_cfg, enc_params, prot_ids, prot_mask)
    adapted = modality_adapter(ad_cfg, ad_params, enc, deterministic=True)
    emb = jnp.concatenate([adapted.astype(jnp.bfloat16), text_emb], axis=1)
    mask = jnp.ones((B, emb.shape[1]), jnp.int32)
    toks = generate(dec_cfg, dec_params, inputs_embeds=emb,
                    attention_mask=mask, gen_cfg=gen_cfg,
                    attn_impl=ATTN, cache_dtype=jnp.bfloat16,
                    kv_bits=kv_bits)
    return np.asarray(toks)


run()                                         # compile + warmup
t0 = time.perf_counter()
run()
dt = time.perf_counter() - t0
print(f"B={B} kv_bits={kv_bits} attn={ATTN}: {dt:.2f}s/batch "
      f"-> {B * 3600 / dt:.0f} desc/h  "
      f"({B * NEW / dt:.0f} tok/s decode-inclusive)")
