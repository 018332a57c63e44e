"""On-chip smoke for the shared-prefix (dedup) decode-attention kernels:
the constant-index prefix block (fetched once per layer call), the merged
prefix+pool softmax, per-row pmask gating, and the unchanged aliased
writes — all against the NON-prefix kernels run on a physically
replicated cache (the interpret tests' oracle, here under Mosaic's real
lowering).  Run: python scripts/smoke_prefix_dedup_tpu.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    from prot2text_tpu.kernels.decode_attention import (
        decode_attention_stacked_verify_qc,
        decode_attention_stacked_verify_qc_prefix,
        decode_attention_stacked_write,
        decode_attention_stacked_write_prefix,
        decode_attention_stacked_write_q,
        decode_attention_stacked_write_q_prefix)
    from prot2text_tpu.models.quant import quantize_kv

    rng = np.random.default_rng(0)
    L, B, Hkv, rep, T, D, Pc = 2, 4, 2, 4, 96, 128, 128
    ck = jnp.asarray(rng.standard_normal((L, B, Hkv, T, D)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((L, B, Hkv, T, D)), jnp.bfloat16)
    pk = jnp.asarray(rng.standard_normal((L, 1, Hkv, Pc, D)), jnp.bfloat16)
    pv = jnp.asarray(rng.standard_normal((L, 1, Hkv, Pc, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, Hkv, rep, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.bfloat16)
    mask = np.ones((B, T), np.int32)
    slots = np.asarray([17, 33, 49, 65], np.int32)   # odd 16-groups
    mask[np.arange(B), slots] = 0
    mask = jnp.asarray(mask)
    pmask = np.zeros((B, Pc), np.int32)
    pmask[0] = 1                      # full prefix
    pmask[1, Pc // 2:] = 1            # left-padded prefix
    pmask[3, Pc - 40:] = 1            # ragged; row 2 gated OFF
    pmask = jnp.asarray(pmask)
    slots = jnp.asarray(slots)

    def rep_cache(c, p):
        return jnp.concatenate(
            [jnp.broadcast_to(p, (L, B) + p.shape[2:]), c],
            axis=3 if p.ndim == 5 else 3)

    # ---- bf16 fused write + prefix -------------------------------------
    got, ck2, cv2 = decode_attention_stacked_write_prefix(
        q, ck.copy(), cv.copy(), mask, kn, vn, 1, slots, pk, pv, pmask)
    ref, ckr2, cvr2 = decode_attention_stacked_write(
        q, rep_cache(ck, pk), rep_cache(cv, pv),
        jnp.concatenate([pmask, mask], axis=1), kn, vn, 1, slots + Pc)
    a, b = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    assert np.allclose(a, b, atol=2e-2), np.abs(a - b).max()
    assert np.array_equal(np.asarray(ck2, np.float32),
                          np.asarray(ckr2, np.float32)[:, :, :, Pc:, :])
    assert np.array_equal(np.asarray(cv2, np.float32),
                          np.asarray(cvr2, np.float32)[:, :, :, Pc:, :])
    print("bf16 fused write + prefix: OK")

    # ---- int8 fused write + prefix -------------------------------------
    ckq, sk = quantize_kv(ck)
    cvq, sv = quantize_kv(cv)
    pkq, psk = quantize_kv(pk)
    pvq, psv = quantize_kv(pv)
    knq, kns = quantize_kv(kn)
    vnq, vns = quantize_kv(vn)
    i8 = lambda x: x.astype(jnp.int8)
    # NOTE: the write kernels DONATE cache + scale operands — always pass
    # fresh copies and never reuse a donated array afterwards
    got, ck2, cv2, sk2, sv2 = decode_attention_stacked_write_q_prefix(
        q, i8(ckq), i8(cvq), sk.copy(), sv.copy(), mask, knq, vnq, kns,
        vns, 1, slots, i8(pkq), i8(pvq), psk, psv, pmask)
    ref, ckr2, cvr2, skr2, svr2 = decode_attention_stacked_write_q(
        q, rep_cache(i8(ckq), i8(pkq)), rep_cache(i8(cvq), i8(pvq)),
        jnp.concatenate([jnp.broadcast_to(psk, (L, B, Hkv, Pc)), sk],
                        axis=3),
        jnp.concatenate([jnp.broadcast_to(psv, (L, B, Hkv, Pc)), sv],
                        axis=3),
        jnp.concatenate([pmask, mask], axis=1), knq, vnq, kns, vns, 1,
        slots + Pc)
    a, b = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    assert np.allclose(a, b, atol=2e-2), np.abs(a - b).max()
    assert np.array_equal(np.asarray(ck2), np.asarray(ckr2)[:, :, :, Pc:, :])
    assert np.array_equal(np.asarray(sv2), np.asarray(svr2)[:, :, :, Pc:])
    print("int8 fused write + prefix: OK")

    # ---- int8 chunk verify + prefix ------------------------------------
    G = 5
    qc = jnp.asarray(rng.standard_normal((B, Hkv, G * rep, D)), jnp.bfloat16)
    knqc, knsc = quantize_kv(
        jnp.asarray(rng.standard_normal((B, Hkv, G, D)), jnp.float32))
    vnqc, vnsc = quantize_kv(
        jnp.asarray(rng.standard_normal((B, Hkv, G, D)), jnp.float32))
    Tc = 128
    ckc, skc = quantize_kv(
        jnp.asarray(rng.standard_normal((L, B, Hkv, Tc, D)), jnp.bfloat16))
    cvc, svc = quantize_kv(
        jnp.asarray(rng.standard_normal((L, B, Hkv, Tc, D)), jnp.bfloat16))
    maskc = np.ones((B, Tc), np.int32)
    slotsc = np.asarray([19, 40, 59, 33], np.int32)
    for i, s in enumerate(slotsc):
        maskc[i, s:] = 0
    maskc = jnp.asarray(maskc)
    slotsc = jnp.asarray(slotsc)
    got, ck2, cv2, sk2, sv2 = decode_attention_stacked_verify_qc_prefix(
        qc, i8(ckc), i8(cvc), skc.copy(), svc.copy(), maskc, knqc, vnqc,
        knsc, vnsc, 1, slotsc, i8(pkq), i8(pvq), psk, psv, pmask)
    ref, ckr2, cvr2, skr2, svr2 = decode_attention_stacked_verify_qc(
        qc, rep_cache(i8(ckc), i8(pkq)), rep_cache(i8(cvc), i8(pvq)),
        jnp.concatenate([jnp.broadcast_to(psk, (L, B, Hkv, Pc)), skc],
                        axis=3),
        jnp.concatenate([jnp.broadcast_to(psv, (L, B, Hkv, Pc)), svc],
                        axis=3),
        jnp.concatenate([pmask, maskc], axis=1), knqc, vnqc, knsc, vnsc, 1,
        slotsc + Pc)
    a, b = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    assert np.allclose(a, b, atol=2e-2), np.abs(a - b).max()
    assert np.array_equal(np.asarray(ck2), np.asarray(ckr2)[:, :, :, Pc:, :])
    assert np.array_equal(np.asarray(cv2), np.asarray(cvr2)[:, :, :, Pc:, :])
    assert np.array_equal(np.asarray(sk2), np.asarray(skr2)[:, :, :, Pc:])
    print("int8 chunk verify + prefix: OK")
    print("ALL OK")


if __name__ == "__main__":
    main()
