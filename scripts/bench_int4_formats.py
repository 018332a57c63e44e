"""In-situ comparison: 14B one-chip decode with the three int4 packings.

The micro-probes disagree with in-situ rates (chained harness ~200 GB/s vs
502 GB/s measured inside the real decode), so this measures what ships:
bench.py's 14B decode path with int4_format bytes / planes / pairs.

Measured (v5e one chip, B=16, Qwen3-14B arch, 8.56 GB resident):
  pairs  : 15.56 ms/step  1028.1 tok/s  550.1 GB/s weights-only  <- default
  planes : 16.38 ms/step   977.0 tok/s  522.7 GB/s
  bytes  : 17.68 ms/step  (round-3 A/B vs planes)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import _init_quantized_random, _param_count   # noqa: E402
from prot2text_tpu.infer.generate import (               # noqa: E402
    GenerationConfig, generate)
from prot2text_tpu.models.qwen3 import Qwen3Config       # noqa: E402

cfg = Qwen3Config.qwen3_14b().core()
B, P, NEW = 16, 128, 64
rng = np.random.default_rng(0)
emb = jnp.asarray(rng.standard_normal((B, P, cfg.hidden_size)), jnp.bfloat16)
mask = jnp.ones((B, P), jnp.int32)


def run_fmt(fmt):
    params = _init_quantized_random(cfg, bits=4, int4_format=fmt)
    wbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(params)
                 if hasattr(x, "dtype"))

    def run(new):
        gc = GenerationConfig(max_new_tokens=new, eos_token_id=-1,
                              pad_token_id=0)
        toks = generate(cfg, params, inputs_embeds=emb, attention_mask=mask,
                        gen_cfg=gc, attn_impl="xla",
                        cache_dtype=jnp.bfloat16)
        return np.asarray(toks)

    for new in (NEW // 2, NEW):
        run(new)                       # compile
    t = {}
    for new in (NEW // 2, NEW):
        t0 = time.perf_counter()
        for _ in range(3):
            run(new)
        t[new] = (time.perf_counter() - t0) / 3
    dt = (t[NEW] - t[NEW // 2]) / (NEW - NEW // 2)
    print(f"{fmt:7s}: {dt*1e3:7.2f} ms/step  {B/dt:7.1f} tok/s  "
          f"{wbytes/dt/1e9:6.1f} GB/s weights-only "
          f"({wbytes/1e9:.2f} GB resident)", flush=True)
    del params
    return dt


if __name__ == "__main__":
    for fmt in (sys.argv[1:] or ("planes", "pairs")):
        run_fmt(fmt)
