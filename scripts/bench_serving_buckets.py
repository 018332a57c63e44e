"""A/B: prompt-bucket granularity at the flagship serving workload.

The bench workload (bench.py _bench_serving_flagship: 24 requests,
prompt lengths 300..1600) prefills 33,024 padded tokens under the round-3
buckets (512, 1664) against 20,556 real prompt tokens — 38% of the
prefill FLOPs are padding.  A finer ladder (384, 512, 768, 1024, 1280,
1408, 1664) pads only 22,784 tokens (-31% prefill compute) at the cost
of more prefill compilations (one per (install-rows, bucket) pair seen;
persistent in .jax_cache).  Prefill is the dominant serving cost at this
workload (~35k tokens x 8B x 2 FLOP ~= 0.56 PFLOP ~= 5.6 s at the
measured ~100 TOP/s bf16xint8 rate, vs ~9 s total), so bucket
granularity is the single biggest end-to-end lever left.

Run:  python scripts/bench_serving_buckets.py
"""

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    fine = (384, 512, 768, 1024, 1280, 1408, 1664)
    for name, buckets in (
        ("serving_spec_kv8_16slots_buckets_coarse", (512, 1664)),
        ("serving_spec_kv8_16slots_buckets_fine", fine),
    ):
        bench._bench_serving_flagship(
            name, kv_bits=8, slots=16, prompt_lookup_tokens=4,
            buckets=buckets)


if __name__ == "__main__":
    main()
