"""Flagship A/B: prefix-KV DEDUP vs replicated prefix serving.

Workload = bench.py bench_serving_flagship_prefix (8B int8 weights, kv8
pool, speculative gamma=4, 24 ragged requests sharing a 512-token chat
header, totals 600..1600, budgets 64..192, fine prompt buckets).  Three
configurations on the one real chip:

  1. replicated, 16 slots  — the round-3 prefix baseline (prefix KV
     seeded into every slot; pool width covers prefix + suffix).
  2. dedup, 16 slots       — same pool count; the prefix KV lives once
     and the fused kernels read it as a constant-index operand (fetched
     once per layer instead of once per row) → per-step bandwidth win.
  3. replicated, 24 slots  — capacity control: the replicated pool at
     24 slots still fits this chip (3.0 GiB), isolating how much of
     dedup's win is bandwidth vs capacity.
  4. dedup, 24 slots       — the HBM freed by dedup (~0.5 GB: 16 slots
     x 512 cols x 32L x 8Hkv x 128D x 2(k+v) int8 + scales) converted
     into pool capacity at 25% less pool footprint.

Measured (v5e one chip, 2026-08-19):
    replicated_16  400.2 tok/s  (pool 2048 MiB)   — round-3 baseline
    dedup_16       389.0 tok/s  (pool 1536 MiB)
    replicated_24  456.7 tok/s  (pool 3072 MiB)
    dedup_24       491.1 tok/s  (pool 2304 MiB)   — +7.5% at equal slots,
                                                    +23% vs the r3 config
Round counts differ between configs (random-weight bf16 near-ties flip
greedy streams, changing speculative acceptance), so per-round numbers
are only indicative; end-to-end on the same workload is the metric.

Run: timeout 3000 python scripts/bench_serving_prefix_dedup.py
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
    N_REQ = 24
    BUCKETS = (384, 512, 768, 1024, 1280, 1408, 1664)
    # suffix lengths 88..1088 → suffix buckets; full-prompt fallback never
    # triggers in this workload, so dedup pools size to the suffix ladder
    SUF_BUCKETS = tuple(b for b in BUCKETS if b <= 1280)
    rng = np.random.default_rng(0)
    plens = [600 + (i * 331) % 1000 for i in range(N_REQ)]
    budgets = [64 + 32 * (i % 5) for i in range(N_REQ)]
    prefix_np = rng.standard_normal((PFX, cfg.hidden_size)).astype(
        np.float32)
    prefix_dev = jax.device_put(jnp.asarray(prefix_np, jnp.bfloat16))

    def padded(arr, plen, buckets):
        pad = next(b for b in buckets if plen <= b)
        e = np.zeros((pad, cfg.hidden_size), np.float32)
        e[pad - plen:] = arr
        return jax.device_put(jnp.asarray(e, jnp.bfloat16))

    suffixes = [padded(rng.standard_normal(
        (p - PFX, cfg.hidden_size)).astype(np.float32), p - PFX,
        SUF_BUCKETS) for p in plens]

    def serve(slots, dedup, buckets):
        eng = ContinuousBatcher(
            cfg, params, max_slots=slots, max_len=buckets[-1] + MAXNEW,
            prompt_pad=buckets, eos_token_id=-1, sync_every=16,
            kv_bits=8, prompt_lookup_tokens=4,
            shared_prefix_embeds=prefix_dev, prefix_dedup=dedup)
        fused = eng._spec_fused
        for i in range(N_REQ):
            eng.submit(i, suffixes[i], max_new_tokens=budgets[i],
                       prompt_len=plens[i] - PFX)
        out = dict(eng.run())
        pool_mb = (eng.state["k"].size + eng.state["v"].size) / 2**20
        return (eng.steps, sum(len(v) for v in out.values()), fused,
                pool_mb, out)

    results = {}
    streams = {}
    for label, slots, dedup in (("replicated_16", 16, False),
                                ("dedup_16", 16, True),
                                ("replicated_24", 24, False),
                                ("dedup_24", 24, True)):
        buckets = SUF_BUCKETS
        serve(slots, dedup, buckets)            # compile warmup
        t0 = time.perf_counter()
        steps, useful, fused, pool_mb, out = serve(slots, dedup, buckets)
        dt = time.perf_counter() - t0
        results[label] = (useful / dt, steps, fused, pool_mb)
        streams[label] = out
        print(f"{label}: {useful / dt:.1f} useful tok/s "
              f"({useful} tok, {steps} verify rounds, dt={dt:.2f}s, "
              f"fused={fused}, pool={pool_mb:.0f} MiB)", flush=True)

    # stream sanity: dedup vs replicated may differ by bf16 accumulation
    # order on random near-tie weights; lengths must match budgets/eos
    for label, out in streams.items():
        assert set(out) == set(range(N_REQ))
        for i in range(N_REQ):
            assert 0 < len(out[i]) <= budgets[i]
    same = sum(streams["replicated_16"][i] == streams["dedup_16"][i]
               for i in range(N_REQ))
    print(f"dedup_16 streams identical to replicated_16 for {same}/{N_REQ} "
          f"requests (bf16 near-tie divergence expected on random weights)")


if __name__ == "__main__":
    main()
