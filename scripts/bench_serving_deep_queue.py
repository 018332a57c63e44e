"""Deep-queue slot sweep at the dedup kv8 speculative 8B flagship.

TODO #3 follow-up: the 24-request prefix-dedup bench showed capacity is
the serving lever (16→24 slots +23%), but slots beyond 24 "need a deeper
request queue than the 24-request bench workload to show up" — a pool
wider than the queue spends its extra slots on the ramp-down tail.  This
probe keeps the flagship per-request shape (512-token shared chat header,
totals 600..1600, budgets 64..192) and scales the QUEUE to 64 requests,
sweeping the pool: 24 / 32 / 40 slots, all prefix-dedup (the pool never
holds the shared header, so 40 slots is ~3.9 GiB of kv8 pool next to
8.5 GiB of weights).

Run: timeout 4500 python scripts/bench_serving_deep_queue.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, "/root/repo")
    import bench
    from prot2text_tpu.infer.serving import ContinuousBatcher
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_1_8b().core()
    params = bench._init_quantized_random(cfg, bits=8)
    PFX = 512
    MAXNEW = 192
    N_REQ = 64
    SUF_BUCKETS = (384, 512, 768, 1024, 1280)
    rng = np.random.default_rng(0)
    plens = [600 + (i * 331) % 1000 for i in range(N_REQ)]
    budgets = [64 + 32 * (i % 5) for i in range(N_REQ)]
    prefix_dev = jax.device_put(jnp.asarray(
        rng.standard_normal((PFX, cfg.hidden_size)), jnp.bfloat16))

    def padded(arr, plen):
        pad = next(b for b in SUF_BUCKETS if plen <= b)
        e = np.zeros((pad, cfg.hidden_size), np.float32)
        e[pad - plen:] = arr
        return jax.device_put(jnp.asarray(e, jnp.bfloat16))

    suffixes = [padded(rng.standard_normal(
        (p - PFX, cfg.hidden_size)).astype(np.float32), p - PFX)
        for p in plens]

    def serve(slots):
        eng = ContinuousBatcher(
            cfg, params, max_slots=slots,
            max_len=SUF_BUCKETS[-1] + MAXNEW, prompt_pad=SUF_BUCKETS,
            eos_token_id=-1, sync_every=16, kv_bits=8,
            prompt_lookup_tokens=4, shared_prefix_embeds=prefix_dev,
            prefix_dedup=True)
        for i in range(N_REQ):
            eng.submit(i, suffixes[i], max_new_tokens=budgets[i],
                       prompt_len=plens[i] - PFX)
        out = dict(eng.run())
        pool_mb = (eng.state["k"].size + eng.state["v"].size) / 2**20
        return (eng.steps, sum(len(v) for v in out.values()),
                eng._spec_fused, pool_mb, out)

    for slots in (24, 32, 40):
        try:
            serve(slots)                        # compile warmup
            t0 = time.perf_counter()
            steps, useful, fused, pool_mb, out = serve(slots)
            dt = time.perf_counter() - t0
            print(f"dedup_{slots}_q64: {useful / dt:.1f} useful tok/s "
                  f"({useful} tok, {steps} verify rounds, dt={dt:.2f}s, "
                  f"fused={fused}, pool={pool_mb:.0f} MiB)", flush=True)
            assert set(out) == set(range(N_REQ))
            for i in range(N_REQ):
                assert 0 < len(out[i]) <= budgets[i]
        except Exception as e:  # noqa: BLE001 — OOM probing is the point
            print(f"dedup_{slots}_q64: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
