"""Phase breakdown of the flagship prefix-shared serving run: wall time
spent in install (prefill dispatches) vs decode rounds vs host glue.

Wraps ContinuousBatcher._install_group / _decode_round with timers (each
ends with a host transfer, so per-phase walls are honest under the remote
tunnel) and prints the split for the bench_serving_flagship_prefix
workload arms.

Usage: python scripts/bench_serving_phases.py [--no_prefix]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from prot2text_tpu.infer.serving import ContinuousBatcher
from prot2text_tpu.models.llama import LlamaConfig
from bench import _init_quantized_random


def run(use_prefix: bool):
    cfg = LlamaConfig.llama_3_1_8b().core()
    params = _init_quantized_random(cfg, bits=8)
    SLOTS, MAXNEW, N_REQ, PFX = 16, 192, 24, 512
    BUCKETS = (384, 512, 768, 1024, 1280, 1408, 1664)
    rng = np.random.default_rng(0)
    plens = [600 + (i * 331) % 1000 for i in range(N_REQ)]
    budgets = [64 + 32 * (i % 5) for i in range(N_REQ)]
    prefix_np = rng.standard_normal((PFX, cfg.hidden_size)).astype(np.float32)
    prefix_dev = jax.device_put(jnp.asarray(prefix_np, jnp.bfloat16))

    def padded(arr, plen):
        pad = next(b for b in BUCKETS if plen <= b)
        e = np.zeros((pad, cfg.hidden_size), np.float32)
        e[pad - plen:] = arr
        return jax.device_put(jnp.asarray(e, jnp.bfloat16))

    prompts, suffixes = [], []
    for i, p in enumerate(plens):
        full = rng.standard_normal((p, cfg.hidden_size)).astype(np.float32)
        full[:PFX] = prefix_np
        suffixes.append(padded(full[PFX:], p - PFX))
        prompts.append(padded(full, p))

    stats = {"install_s": 0.0, "installs": 0, "decode_s": 0.0, "decodes": 0}

    def serve(n, timed):
        eng = ContinuousBatcher(
            cfg, params, max_slots=SLOTS, max_len=BUCKETS[-1] + MAXNEW,
            prompt_pad=BUCKETS, eos_token_id=-1, sync_every=16,
            kv_bits=8, prompt_lookup_tokens=4,
            shared_prefix_embeds=prefix_dev if use_prefix else None)
        if timed:
            ig, dr = eng._install_group, eng._decode_round

            def install_group(installs, pad, upfx=False):
                t0 = time.perf_counter()
                out = list(ig(installs, pad, upfx))
                stats["install_s"] += time.perf_counter() - t0
                stats["installs"] += 1
                return iter(out)

            def decode_round():
                t0 = time.perf_counter()
                out = list(dr())
                stats["decode_s"] += time.perf_counter() - t0
                stats["decodes"] += 1
                return iter(out)

            eng._install_group = install_group
            eng._decode_round = decode_round
        for i in range(n):
            if use_prefix:
                eng.submit(i, suffixes[i], max_new_tokens=budgets[i],
                           prompt_len=plens[i] - PFX)
            else:
                eng.submit(i, prompts[i], max_new_tokens=budgets[i],
                           prompt_len=plens[i])
        out = dict(eng.run())
        return eng.steps, sum(len(v) for v in out.values())

    serve(N_REQ, timed=False)                 # warm compiles
    t0 = time.perf_counter()
    steps, useful = serve(N_REQ, timed=True)
    total = time.perf_counter() - t0
    other = total - stats["install_s"] - stats["decode_s"]
    print(f"use_prefix={use_prefix} total={total:.2f}s "
          f"useful={useful} ({useful/total:.1f} tok/s)")
    print(f"  install: {stats['install_s']:.2f}s over {stats['installs']} "
          f"dispatches ({stats['install_s']/max(stats['installs'],1)*1e3:.0f}"
          f" ms each)")
    print(f"  decode:  {stats['decode_s']:.2f}s over {stats['decodes']} "
          f"rounds ({steps} verify/plain steps)")
    print(f"  other (host glue): {other:.2f}s")


if __name__ == "__main__":
    run(use_prefix="--no_prefix" not in sys.argv)
