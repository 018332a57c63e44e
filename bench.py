"""Benchmark: batched KV-cached decode throughput (flagship decode path).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is null until
an A6000 reference measurement exists.

Decoder: 8L × h1024 (GQA 16/8, SwiGLU 4096) in bf16 — sized so that
compile-through-the-axon-tunnel + 3 timed runs fit the driver's budget;
the persistent compilation cache (.jax_cache) amortizes recompiles across
rounds.  Timing forces a host transfer per run because block_until_ready
does not synchronize through the remote-execution tunnel.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.decoder import DecoderConfig, init_decoder_params

    cfg = DecoderConfig(
        vocab_size=32000, hidden_size=1024, num_layers=8, num_heads=16,
        num_kv_heads=8, intermediate_size=4096, head_dim=64,
        rope_theta=500000.0)
    dtype = jnp.bfloat16
    params = init_decoder_params(cfg, jax.random.PRNGKey(0), dtype)

    B, P, NEW = 16, 128, 128
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
        return np.asarray(toks)

    run()  # compile + warmup
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters

    toks_per_sec = B * NEW / dt
    print(json.dumps({
        "metric": "decode_tokens_per_sec_bf16_8Lx1024_b16",
        "value": round(toks_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
