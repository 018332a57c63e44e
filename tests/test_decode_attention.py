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


@pytest.mark.parametrize("per_row", [False, True])
def test_fused_write_matches_attention_and_updates_slot(per_row):
    """Fused kernel == plain kernel for attention; cache gets exactly the
    new slot written (per-row slots exercise the serving engine's path)."""
    rng = np.random.default_rng(1)
    L, B, Hkv, rep, T, D = 3, 4, 2, 4, 16, 128
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
