"""Pallas grouped decode-attention kernel vs the decode step's XLA einsum
chain (kernels/decode_attention.py; interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prot2text_tpu.kernels.decode_attention import (
    decode_attention_stacked, decode_attention_stacked_write,
    supports_decode_attention,
)


@pytest.mark.parametrize("rep", [1, 4])
def test_matches_xla_einsum_chain(rep):
    rng = np.random.default_rng(0)
    L, B, Hkv, T, D = 3, 4, 2, 16, 128
    ck = jnp.asarray(rng.standard_normal((L, B, Hkv, T, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, B, Hkv, T, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hkv, rep, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.int32)
    mask = mask.at[:, 0].set(1)          # at least one valid slot per row
    for li in (0, 2):
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                         jnp.finfo(jnp.float32).min)
        lo = jnp.einsum("bkrd,bktd->bkrt", q, ck[li]) + bias
        ln = jnp.einsum("bkrd,bkd->bkr", q, kn)[..., None]
        w = jax.nn.softmax(jnp.concatenate([lo, ln], -1), axis=-1)
        ref = (jnp.einsum("bkrt,bktd->bkrd", w[..., :T], cv[li])
               + w[..., T:] * vn[:, :, None, :])
        got = decode_attention_stacked(q, ck, cv, mask, kn, vn, li,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_supports_gate():
    class C:
        pass

    assert supports_decode_attention(C(), (32, 16, 8, 192, 128))
    assert not supports_decode_attention(C(), (32, 16, 8, 193, 128))  # T%8
    assert not supports_decode_attention(C(), (32, 16, 8, 192, 64))   # D
    # VMEM bound respects the actual cache dtype (16.8 MB bf16 tile fits
    # the 24 MB gate; the same shape in f32 is 33.5 MB and must not)
    assert supports_decode_attention(C(), (2, 2, 8, 4096, 128))
    assert supports_decode_attention(C(), (2, 2, 8, 4096, 128),
                                     jnp.bfloat16)
    assert not supports_decode_attention(C(), (2, 2, 8, 4096, 128),
                                         jnp.float32)
    # fused-write variant additionally needs T % 16 (bf16 tile groups)
    from prot2text_tpu.kernels.decode_attention import (
        supports_decode_attention_write)
    assert supports_decode_attention_write(C(), (32, 16, 8, 192, 128))
    assert not supports_decode_attention_write(C(), (32, 16, 8, 184, 128))


@pytest.mark.parametrize("per_row", [False, True])
def test_fused_write_matches_attention_and_updates_slot(per_row):
    """Fused kernel == plain kernel for attention; cache gets exactly the
    new slot written (per-row slots exercise the serving engine's path)."""
    rng = np.random.default_rng(1)
    # T=48 spans three 16-row bf16 tile groups so per-row slots exercise
    # the kernel's dynamic tile-group loads at odd (non-zero) groups
    L, B, Hkv, rep, T, D = 3, 4, 2, 4, 48, 128
    ck = jnp.asarray(rng.standard_normal((L, B, Hkv, T, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, B, Hkv, T, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hkv, rep, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.int32)
    mask = mask.at[:, 0].set(1)
    slots = (jnp.asarray(rng.integers(0, T, (B,)), jnp.int32) if per_row
             else jnp.asarray(7, jnp.int32))
    for li in (0, 2):
        ref = decode_attention_stacked(q, ck, cv, mask, kn, vn, li,
                                       interpret=True)
        got, ck2, cv2 = decode_attention_stacked_write(
            q, ck.copy(), cv.copy(), mask, kn, vn, li, slots,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
        exp_k = np.array(ck)
        exp_v = np.array(cv)
        srow = np.broadcast_to(np.asarray(slots).reshape(-1), (B,))
        for b in range(B):
            exp_k[li, b, :, srow[b], :] = np.asarray(kn)[b]
            exp_v[li, b, :, srow[b], :] = np.asarray(vn)[b]
        np.testing.assert_array_equal(np.asarray(ck2), exp_k)
        np.testing.assert_array_equal(np.asarray(cv2), exp_v)


def test_verify_chunk_kernel_matches_reference():
    """Chunk-verify kernel (decode_attention_stacked_verify_qc): attention
    over [masked stale cache ‖ intra-chunk causal] matches a jnp reference
    per query token, and the chunk's G slots (values + scales) are written
    in place at per-row start columns."""
    from prot2text_tpu.kernels.decode_attention import (
        decode_attention_stacked_verify_qc)

    rng = np.random.default_rng(3)
    L, B, Hkv, rep, T, D, G = 2, 3, 2, 4, 128, 128, 3
    ck = jnp.asarray(rng.integers(-127, 128, (L, B, Hkv, T, D)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 128, (L, B, Hkv, T, D)), jnp.int8)
    sk = jnp.asarray(rng.random((L, B, Hkv, T)) * 0.02 + 1e-3, jnp.float32)
    sv = jnp.asarray(rng.random((L, B, Hkv, T)) * 0.02 + 1e-3, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Hkv, G * rep, D)) * 0.1,
                    jnp.float32)
    knq = jnp.asarray(rng.integers(-127, 128, (B, Hkv, G, D)), jnp.float32)
    vnq = jnp.asarray(rng.integers(-127, 128, (B, Hkv, G, D)), jnp.float32)
    kns = jnp.asarray(rng.random((B, Hkv, G)) * 0.02 + 1e-3, jnp.float32)
    vns = jnp.asarray(rng.random((B, Hkv, G)) * 0.02 + 1e-3, jnp.float32)
    starts = jnp.asarray([0, 33, T - 64], jnp.int32)
    mask = np.zeros((B, T), np.int32)
    for b, s in enumerate(np.asarray(starts)):
        mask[b, :s] = 1                      # valid prefix before the chunk
    mask = jnp.asarray(mask)

    li = 1
    got, ck2, cv2, sk2, sv2 = decode_attention_stacked_verify_qc(
        q, ck.copy(), cv.copy(), sk.copy(), sv.copy(), mask,
        knq, vnq, kns, vns, li, starts, interpret=True)

    # ---- attention reference --------------------------------------------
    ckf = np.asarray(ck[li], np.float32) * np.asarray(sk[li])[..., None]
    cvf = np.asarray(cv[li], np.float32) * np.asarray(sv[li])[..., None]
    knf = np.asarray(knq) * np.asarray(kns)[..., None]
    vnf = np.asarray(vnq) * np.asarray(vns)[..., None]
    qn = np.asarray(q, np.float32)
    NEG = float(np.finfo(np.float32).min)
    for b in range(B):
        for h in range(Hkv):
            for row in range(G * rep):
                g = row // rep
                lo = qn[b, h, row] @ ckf[b, h].T            # (T,)
                lo = np.where(np.asarray(mask)[b] > 0, lo, NEG)
                ln = qn[b, h, row] @ knf[b, h].T            # (G,)
                ln = np.where(np.arange(G) <= g, ln, NEG)
                m = max(lo.max(), ln.max())
                el, en = np.exp(lo - m), np.exp(ln - m)
                ref = (el @ cvf[b, h] + en @ vnf[b, h]) / (
                    el.sum() + en.sum())
                np.testing.assert_allclose(
                    np.asarray(got)[b, h, row], ref, atol=2e-2, rtol=2e-2)

    # ---- chunk write reference ------------------------------------------
    exp_k, exp_v = np.array(ck), np.array(cv)
    exp_sk, exp_sv = np.array(sk), np.array(sv)
    for b, s in enumerate(np.asarray(starts)):
        exp_k[li, b, :, s:s + G, :] = np.asarray(knq)[b].transpose(0, 1, 2)
        exp_v[li, b, :, s:s + G, :] = np.asarray(vnq)[b]
        exp_sk[li, b, :, s:s + G] = np.asarray(kns)[b]
        exp_sv[li, b, :, s:s + G] = np.asarray(vns)[b]
    np.testing.assert_array_equal(np.asarray(ck2), exp_k)
    np.testing.assert_array_equal(np.asarray(cv2), exp_v)
    np.testing.assert_array_equal(np.asarray(sk2), exp_sk)
    np.testing.assert_array_equal(np.asarray(sv2), exp_sv)
