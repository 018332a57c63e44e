"""Isolate the pure decode-step time of the descriptions/hour config
(14B int4 + kv8, desc-hour shapes) across batch sizes.

Two-point measurement: NEW=128 vs NEW=256 from the same prompt — the
prefill cost cancels in the difference and the quotient is the pure
per-step decode time (cache widths differ by the extra 128 slots, so the
implied GB/s is a mild overestimate of the long-run rate).

    python scripts/bench_desc_step.py 16 32 40
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
from prot2text_tpu.models.qwen3 import Qwen3Config       # noqa: E402

PROT, NEW_HI, NEW_LO = 544, 256, 128
dec_cfg = Qwen3Config.qwen3_14b().core()
dec_params = _init_quantized_random(dec_cfg, bits=4)


def step_time(B):
    rng = np.random.default_rng(0)
    emb = jnp.asarray(
        rng.standard_normal((B, PROT, dec_cfg.hidden_size)).astype(
            np.float32), jnp.bfloat16)
    mask = jnp.ones((B, PROT), jnp.int32)

    def run(new):
        gen_cfg = GenerationConfig(max_new_tokens=new, eos_token_id=-1,
                                   pad_token_id=0)
        toks = generate(dec_cfg, dec_params, inputs_embeds=emb,
                        attention_mask=mask, gen_cfg=gen_cfg,
                        attn_impl="auto", cache_dtype=jnp.bfloat16,
                        kv_bits=8)
        return np.asarray(toks)

    for new in (NEW_LO, NEW_HI):
        run(new)                                  # compile + warmup
    times = {}
    for new in (NEW_LO, NEW_HI):
        t0 = time.perf_counter()
        run(new)
        times[new] = time.perf_counter() - t0
    dt = (times[NEW_HI] - times[NEW_LO]) / (NEW_HI - NEW_LO)
    # per-step HBM bytes: packed weights once + live cache (int8 + f32
    # scales) once
    wbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(dec_params)
                 if hasattr(x, "dtype"))
    T = PROT + NEW_HI
    cbytes = (2 * dec_cfg.num_layers * B * dec_cfg.num_kv_heads
              * (T * dec_cfg.head_dim * 1 + T * 4))
    print(f"B={B}: decode {dt*1e3:6.2f} ms/step  {B/dt:7.0f} tok/s  "
          f"(t128={times[NEW_LO]:.2f}s t256={times[NEW_HI]:.2f}s; "
          f"weights {wbytes/1e9:.2f} GB + cache {cbytes/1e9:.2f} GB "
          f"-> {(wbytes+cbytes)/dt/1e9:5.0f} GB/s)", flush=True)


for arg in sys.argv[1:] or ["16", "32"]:
    step_time(int(arg))
