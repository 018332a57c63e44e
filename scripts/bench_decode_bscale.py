"""Batch-scaling probe for the 8B-int8 one-chip decode headline.

Question: at B=128 the decode step is reported MXU-bound in the weight
matmuls (~13.2 of 18.7 ms) — but the weight STREAM (7.5 GB / 13.2 ms ≈
570 GB/s) is also below the 819 GB/s roofline, i.e. the step is in the
mixed regime.  If compute has headroom, B=192/256 raise tok/s; if the
matmuls are truly MXU-saturated, step time grows ~linearly and tok/s is
flat.  HBM at B=256 with a bf16 cache (T=192) is ~6.4 GB + 8.5 GB weights
— near the edge, so each B runs in this one process with try/except and
the kv8 cache variant is probed too (halves cache bytes AND the
attention read).

    python scripts/bench_decode_bscale.py
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

cfg = LlamaConfig.llama_3_1_8b().core()
params = _init_quantized_random(cfg, bits=8)

NEW = 64
for B, kv_bits in ((128, None), (192, None), (256, None),
                   (256, 8), (320, 8), (384, 8)):
    try:
        rng = np.random.default_rng(0)
        emb = jnp.asarray(rng.standard_normal((B, 128, cfg.hidden_size)),
                          jnp.bfloat16)
        mask = jnp.ones((B, 128), jnp.int32)

        def run(new):
            gc = GenerationConfig(max_new_tokens=new, eos_token_id=-1,
                                  pad_token_id=0)
            return np.asarray(generate(
                cfg, params, inputs_embeds=emb, attention_mask=mask,
                gen_cfg=gc, attn_impl="xla", cache_dtype=jnp.bfloat16,
                kv_bits=kv_bits))

        for new in (NEW // 2, NEW):
            run(new)                       # compile both lengths
        t = {}
        for new in (NEW // 2, NEW):
            t0 = time.perf_counter()
            for _ in range(3):
                run(new)
            t[new] = (time.perf_counter() - t0) / 3
        dt = (t[NEW] - t[NEW // 2]) / (NEW - NEW // 2)
        print(f"B={B:3d} kv={kv_bits}: {dt*1e3:7.2f} ms/step  "
              f"{B/dt:7.1f} tok/s", flush=True)
    except Exception as e:  # noqa: BLE001 — OOM probing is the point
        print(f"B={B:3d} kv={kv_bits}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
