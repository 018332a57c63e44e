"""Gamma (draft length) sweep for speculative serving at the kv8 16-slot
8B flagship workload.  The (B,2)-grid verify kernel made a G=5 round cost
only 1.38x a single-token step (bench_spec_floor.py), so on
high-acceptance streams a longer draft may buy more tokens per round for
little extra round cost.  Random-weight streams accept near the upper
bound — this sweep bounds the HIGH-acceptance regime; the default stays
gamma=4 (low-acceptance streams degrade toward one token per round, and
a bigger gamma wastes more forward rows per rejection).

    python scripts/bench_spec_gamma.py [gammas...]
"""
import sys

sys.path.insert(0, "/root/repo")

import bench


gammas = [int(g) for g in sys.argv[1:]] or [4, 6, 8]
for g in gammas:
    bench._bench_serving_flagship(
        f"serving_spec_g{g}", kv_bits=8, slots=16, prompt_lookup_tokens=g)
