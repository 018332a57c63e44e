"""Shared-prefix (dedup) decode-attention kernels, interpret mode.

Equivalence oracle: each prefix kernel must match its NON-prefix sibling
run on a cache where the prefix is physically replicated into every
batch row (the round-3 seeded layout) — same masks, slots shifted by
prefix_cols.  This covers the softmax merge, the per-row prefix gating
(a row whose pmask is all-zero must behave as if the prefix were
absent), and the aliased slot/chunk writes (which must land at the same
pool positions and values as the replicated run's, minus the prefix
columns).  Kernels: kernels/decode_attention.py prefix section; engine
wiring: infer/serving.ContinuousBatcher(prefix_dedup=True).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prot2text_tpu.kernels.decode_attention import (
    decode_attention_stacked_verify_qc,
    decode_attention_stacked_verify_qc_prefix,
    decode_attention_stacked_write,
    decode_attention_stacked_write_prefix,
    decode_attention_stacked_write_q,
    decode_attention_stacked_write_q_prefix,
)
from prot2text_tpu.models.quant import quantize_kv

L, B, Hkv, rep, D = 2, 3, 2, 2, 128
Pc = 32


def _mk(key, shape, scale=1.0):
    return jax.random.normal(key, shape, jnp.float32) * scale


def _masks(T, filled, key):
    mask = np.zeros((B, T), np.int32)
    mask[:, :filled] = 1
    # per-row prefix validity: row 0 full, row 1 left-padded (half valid),
    # row 2 gated OFF entirely (a full-prompt request in a dedup pool)
    pmask = np.zeros((B, Pc), np.int32)
    pmask[0, :] = 1
    pmask[1, Pc // 2:] = 1
    return jnp.asarray(mask), jnp.asarray(pmask)


def test_write_prefix_kernel_matches_replicated():
    T = 64
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    ck = _mk(ks[0], (L, B, Hkv, T, D)).astype(jnp.bfloat16)
    cv = _mk(ks[1], (L, B, Hkv, T, D)).astype(jnp.bfloat16)
    pk = _mk(ks[2], (L, 1, Hkv, Pc, D)).astype(jnp.bfloat16)
    pv = _mk(ks[3], (L, 1, Hkv, Pc, D)).astype(jnp.bfloat16)
    qg = _mk(ks[4], (B, Hkv, rep, D)).astype(jnp.bfloat16)
    kn = _mk(ks[5], (B, Hkv, D)).astype(jnp.bfloat16)
    vn = _mk(ks[6], (B, Hkv, D)).astype(jnp.bfloat16)
    mask, pmask = _masks(T, 17, ks[7])
    slots = jnp.array([17, 33, 18], jnp.int32)
    layer = 1

    ck0, cv0 = np.asarray(ck), np.asarray(cv)
    a, ck2, cv2 = decode_attention_stacked_write_prefix(
        qg, ck, cv, mask, kn, vn, layer, slots, pk, pv, pmask,
        interpret=True)

    # replicated oracle: prefix seeded into every row's cache
    ckr = jnp.concatenate(
        [jnp.broadcast_to(pk, (L, B, Hkv, Pc, D)), jnp.asarray(ck0)], axis=3)
    cvr = jnp.concatenate(
        [jnp.broadcast_to(pv, (L, B, Hkv, Pc, D)), jnp.asarray(cv0)], axis=3)
    maskr = jnp.concatenate([pmask, mask], axis=1)
    ar, ckr2, cvr2 = decode_attention_stacked_write(
        qg, ckr, cvr, maskr, kn, vn, layer, slots + Pc, interpret=True)

    np.testing.assert_allclose(
        np.asarray(a, jnp.float32), np.asarray(ar, jnp.float32),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(ck2, jnp.float32),
        np.asarray(ckr2, jnp.float32)[:, :, :, Pc:, :])
    np.testing.assert_array_equal(
        np.asarray(cv2, jnp.float32),
        np.asarray(cvr2, jnp.float32)[:, :, :, Pc:, :])
    # the gated row equals a prefix-free run entirely
    a0, _, _ = decode_attention_stacked_write(
        qg, jnp.asarray(ck0), jnp.asarray(cv0), mask, kn, vn, layer, slots,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(a, jnp.float32)[2], np.asarray(a0, jnp.float32)[2],
        rtol=2e-2, atol=2e-2)


def _quant_pair(key, shape):
    f = _mk(key, shape)
    q, s = quantize_kv(f)
    return q.astype(jnp.int8), s


def test_write_q_prefix_kernel_matches_replicated():
    T = 64
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    ck, sk = _quant_pair(ks[0], (L, B, Hkv, T, D))
    cv, sv = _quant_pair(ks[1], (L, B, Hkv, T, D))
    pk, psk = _quant_pair(ks[2], (L, 1, Hkv, Pc, D))
    pv, psv = _quant_pair(ks[3], (L, 1, Hkv, Pc, D))
    qg = _mk(ks[4], (B, Hkv, rep, D)).astype(jnp.bfloat16)
    knq, kns = quantize_kv(_mk(ks[5], (B, Hkv, D)))
    vnq, vns = quantize_kv(_mk(ks[6], (B, Hkv, D)))
    mask, pmask = _masks(T, 21, ks[7])
    slots = jnp.array([21, 47, 22], jnp.int32)
    layer = 0

    ck0, cv0, sk0, sv0 = map(np.asarray, (ck, cv, sk, sv))
    a, ck2, cv2, sk2, sv2 = decode_attention_stacked_write_q_prefix(
        qg, ck, cv, sk, sv, mask, knq, vnq, kns, vns, layer, slots,
        pk, pv, psk, psv, pmask, interpret=True)

    ckr = jnp.concatenate(
        [jnp.broadcast_to(pk, (L, B, Hkv, Pc, D)), jnp.asarray(ck0)], axis=3)
    cvr = jnp.concatenate(
        [jnp.broadcast_to(pv, (L, B, Hkv, Pc, D)), jnp.asarray(cv0)], axis=3)
    skr = jnp.concatenate(
        [jnp.broadcast_to(psk, (L, B, Hkv, Pc)), jnp.asarray(sk0)], axis=3)
    svr = jnp.concatenate(
        [jnp.broadcast_to(psv, (L, B, Hkv, Pc)), jnp.asarray(sv0)], axis=3)
    maskr = jnp.concatenate([pmask, mask], axis=1)
    ar, ckr2, cvr2, skr2, svr2 = decode_attention_stacked_write_q(
        qg, ckr, cvr, skr, svr, maskr, knq, vnq, kns, vns, layer,
        slots + Pc, interpret=True)

    np.testing.assert_allclose(
        np.asarray(a, jnp.float32), np.asarray(ar, jnp.float32),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(ck2),
                                  np.asarray(ckr2)[:, :, :, Pc:, :])
    np.testing.assert_array_equal(np.asarray(cv2),
                                  np.asarray(cvr2)[:, :, :, Pc:, :])
    np.testing.assert_array_equal(np.asarray(sk2),
                                  np.asarray(skr2)[:, :, :, Pc:])
    np.testing.assert_array_equal(np.asarray(sv2),
                                  np.asarray(svr2)[:, :, :, Pc:])


@pytest.mark.parametrize("G", [3, 5])
def test_verify_qc_prefix_kernel_matches_replicated(G):
    T = 128
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 8)
    ck, sk = _quant_pair(ks[0], (L, B, Hkv, T, D))
    cv, sv = _quant_pair(ks[1], (L, B, Hkv, T, D))
    pk, psk = _quant_pair(ks[2], (L, 1, Hkv, Pc, D))
    pv, psv = _quant_pair(ks[3], (L, 1, Hkv, Pc, D))
    qg = _mk(ks[4], (B, Hkv, G * rep, D)).astype(jnp.bfloat16)
    knq, kns = quantize_kv(_mk(ks[5], (B, Hkv, G, D)))
    vnq, vns = quantize_kv(_mk(ks[6], (B, Hkv, G, D)))
    mask, pmask = _masks(T, 19, ks[7])
    slots = jnp.array([19, 40, 64 - G], jnp.int32)   # spans 2 tile groups
    layer = 1

    ck0, cv0, sk0, sv0 = map(np.asarray, (ck, cv, sk, sv))
    a, ck2, cv2, sk2, sv2 = decode_attention_stacked_verify_qc_prefix(
        qg, ck, cv, sk, sv, mask, knq, vnq, kns, vns, layer, slots,
        pk, pv, psk, psv, pmask, interpret=True)

    ckr = jnp.concatenate(
        [jnp.broadcast_to(pk, (L, B, Hkv, Pc, D)), jnp.asarray(ck0)], axis=3)
    cvr = jnp.concatenate(
        [jnp.broadcast_to(pv, (L, B, Hkv, Pc, D)), jnp.asarray(cv0)], axis=3)
    skr = jnp.concatenate(
        [jnp.broadcast_to(psk, (L, B, Hkv, Pc)), jnp.asarray(sk0)], axis=3)
    svr = jnp.concatenate(
        [jnp.broadcast_to(psv, (L, B, Hkv, Pc)), jnp.asarray(sv0)], axis=3)
    maskr = jnp.concatenate([pmask, mask], axis=1)
    ar, ckr2, cvr2, skr2, svr2 = decode_attention_stacked_verify_qc(
        qg, ckr, cvr, skr, svr, maskr, knq, vnq, kns, vns, layer,
        slots + Pc, interpret=True)

    np.testing.assert_allclose(
        np.asarray(a, jnp.float32), np.asarray(ar, jnp.float32),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(ck2),
                                  np.asarray(ckr2)[:, :, :, Pc:, :])
    np.testing.assert_array_equal(np.asarray(cv2),
                                  np.asarray(cvr2)[:, :, :, Pc:, :])
    np.testing.assert_array_equal(np.asarray(sk2),
                                  np.asarray(skr2)[:, :, :, Pc:])
    np.testing.assert_array_equal(np.asarray(sv2),
                                  np.asarray(svr2)[:, :, :, Pc:])
