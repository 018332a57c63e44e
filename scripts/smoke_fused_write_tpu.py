"""On-chip smoke for the fused attention+write kernels' dynamic tile-group
loads: bf16 kernel (16-sublane groups) and int8 kernel (32-sublane groups)
with per-row slots landing in ODD tile groups — the case interpret-mode CPU
tests cannot validate against Mosaic's lowering rules.

Run: python scripts/smoke_fused_write_tpu.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    from prot2text_tpu.kernels.decode_attention import (
        decode_attention_stacked, decode_attention_stacked_write,
        decode_attention_stacked_write_q)
    from prot2text_tpu.models.quant import quantize_kv

    rng = np.random.default_rng(0)
    L, B, Hkv, rep, T, D = 2, 4, 2, 4, 96, 128
    ck = jnp.asarray(rng.standard_normal((L, B, Hkv, T, D)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((L, B, Hkv, T, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, Hkv, rep, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)
    # odd bf16 tile groups: slots 17, 33, 49, 65 hit groups 1..4
    slots = jnp.asarray([17, 33, 49, 65], jnp.int32)
    mask = mask.at[jnp.arange(B), slots].set(0)

    ref = decode_attention_stacked(q, ck, cv, mask, kn, vn, 1)
    got, ck2, cv2 = decode_attention_stacked_write(
        q, ck.copy(), cv.copy(), mask, kn, vn, 1, slots)
    a, b = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    assert np.allclose(a, b, atol=2e-2), np.abs(a - b).max()
    ck2 = np.asarray(ck2, np.float32)
    exp = np.asarray(ck, np.float32)
    for i in range(B):
        exp[1, i, :, int(slots[i]), :] = np.asarray(kn, np.float32)[i]
    assert np.array_equal(ck2, exp), "bf16 stale-group corruption"
    print("bf16 fused write (odd 16-groups): OK")

    ckq, sk = quantize_kv(ck)
    cvq, sv = quantize_kv(cv)
    knq, kns = quantize_kv(kn)
    vnq, vns = quantize_kv(vn)
    # reference over the DEQUANTIZED cache (bf16 holds int8 exactly)
    ref_q = decode_attention_stacked(
        q, (ckq * sk[..., None]).astype(jnp.bfloat16),
        (cvq * sv[..., None]).astype(jnp.bfloat16), mask,
        (knq * kns[..., None]).astype(jnp.bfloat16),
        (vnq * vns[..., None]).astype(jnp.bfloat16), 1)
    got_q, ck3, cv3, sk3, sv3 = decode_attention_stacked_write_q(
        q, ckq.astype(jnp.int8), cvq.astype(jnp.int8), sk.copy(), sv.copy(),
        mask, knq, vnq, kns, vns, 1, slots)
    aq = np.asarray(ref_q, np.float32)
    gq = np.asarray(got_q, np.float32)
    # kernel folds v_scale into the softmax weights pre-matmul (different
    # accumulation order than the dequantize-first reference): ~6e-2 at
    # N(0,1) values
    assert np.allclose(aq, gq, atol=8e-2), np.abs(aq - gq).max()
    ck3 = np.asarray(ck3)
    expq = np.array(ckq.astype(jnp.int8))
    for i in range(B):
        expq[1, i, :, int(slots[i]), :] = np.asarray(
            knq.astype(jnp.int8))[i]
    assert np.array_equal(ck3, expq), "int8 stale-group corruption"
    print("int8 fused write (odd 32-groups): OK")


if __name__ == "__main__":
    main()
