"""On-chip parity + A/B for the FUSED decode-attention + cache-write kernel
(kernels/decode_attention.decode_attention_stacked_write) inside the real
8B int8 decode.

Variants (each in its own process — the flags are read at trace time):

    P2T_FUSED_CACHE_WRITE=1 python scripts/bench_decode_fused.py fused
    python scripts/bench_decode_fused.py split            (default dispatch)
    P2T_NO_PALLAS_DECODE_ATTN=1 python scripts/bench_decode_fused.py xla
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
from prot2text_tpu.models.llama import LlamaConfig       # noqa: E402

label = sys.argv[1] if len(sys.argv) > 1 else "?"
cfg = LlamaConfig.llama_3_1_8b().core()
params = _init_quantized_random(cfg, bits=8)

for B, NEW in ((128, 64), (16, 64)):
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((B, 128, cfg.hidden_size)),
                      jnp.bfloat16)
    mask = jnp.ones((B, 128), jnp.int32)

    def run(new):
        gc = GenerationConfig(max_new_tokens=new, eos_token_id=-1,
                              pad_token_id=0)
        return np.asarray(generate(
            cfg, params, inputs_embeds=emb, attention_mask=mask,
            gen_cfg=gc, attn_impl="xla", cache_dtype=jnp.bfloat16))

    toks = {}
    for new in (NEW // 2, NEW):
        toks[new] = run(new)
    t = {}
    for new in (NEW // 2, NEW):
        t0 = time.perf_counter()
        for _ in range(3):
            run(new)
        t[new] = (time.perf_counter() - t0) / 3
    dt = (t[NEW] - t[NEW // 2]) / (NEW - NEW // 2)
    print(f"{label} B={B:3d}: {dt*1e3:7.2f} ms/step  {B/dt:7.1f} tok/s  "
          f"tokens[0,:8]={toks[NEW][0, :8].tolist()}", flush=True)
