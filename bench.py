"""Benchmark: batched KV-cached decode throughput on the flagship decoder.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is null until
an A6000 reference measurement exists.

Config: Llama-3.2-1B-shaped decoder (the smallest reference legacy config,
BASELINE.json configs[0]) in bf16, batch 8, prompt 128, 64 new tokens.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.decoder import init_decoder_params
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_2_1b().core()
    dtype = jnp.bfloat16
    params = init_decoder_params(cfg, jax.random.PRNGKey(0), dtype)

    B, P, NEW = 8, 128, 64
    rng = np.random.default_rng(0)
    emb = jnp.asarray(
        rng.standard_normal((B, P, cfg.hidden_size)).astype(np.float32),
        dtype)
    mask = jnp.ones((B, P), jnp.int32)
    gen_cfg = GenerationConfig(
        max_new_tokens=NEW, eos_token_id=-1, pad_token_id=0)  # never stop

    def run():
        toks = generate(cfg, params, inputs_embeds=emb, attention_mask=mask,
                        gen_cfg=gen_cfg, attn_impl="xla", cache_dtype=dtype)
        # host transfer — block_until_ready alone may not synchronize through
        # the remote-execution tunnel
        return np.asarray(toks)

    run()  # compile + warmup
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters

    toks_per_sec = B * NEW / dt
    print(json.dumps({
        "metric": "decode_tokens_per_sec_1b_bf16",
        "value": round(toks_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
