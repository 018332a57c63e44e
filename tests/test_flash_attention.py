"""Flash-attention kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from prot2text_tpu.kernels.attention import _xla_attention
from prot2text_tpu.kernels.flash_attention import flash_attention_tpu
from prot2text_tpu.models.transformer import make_attention_bias


def _qkv(B=2, H=3, Sq=40, Skv=40, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Skv, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Skv, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_xla_bidirectional_padded():
    q, k, v = _qkv()
    mask = np.ones((2, 40), np.int32)
    mask[1, 25:] = 0
    bias = make_attention_bias(jnp.asarray(mask))
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention_tpu(q, k, v, bias, block_q=16, block_k=16,
                              interpret=True)
    # padded-key columns: compare only valid query rows (all rows valid here)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_matches_xla_causal():
    q, k, v = _qkv(Sq=24, Skv=24, seed=1)
    mask = np.ones((2, 24), np.int32)
    mask[0, :5] = 0  # left padding
    pos = jnp.broadcast_to(jnp.arange(24), (2, 24))
    bias = make_attention_bias(jnp.asarray(mask), causal=True,
                               q_positions=pos, kv_positions=pos)
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention_tpu(q, k, v, bias, block_q=8, block_k=8,
                              interpret=True)
    valid = np.asarray(mask).astype(bool)
    o = np.asarray(out).transpose(0, 2, 1, 3)[valid]
    r = np.asarray(ref).transpose(0, 2, 1, 3)[valid]
    np.testing.assert_allclose(o, r, atol=2e-5, rtol=2e-5)


def test_flash_non_divisible_lengths():
    q, k, v = _qkv(Sq=37, Skv=53, seed=2)
    mask = np.ones((2, 53), np.int32)
    mask[1, 40:] = 0
    bias = make_attention_bias(jnp.asarray(mask))
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention_tpu(q, k, v, bias, block_q=16, block_k=16,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    q, k, v = _qkv(Sq=32, Skv=32, seed=3)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    mask = np.ones((2, 32), np.int32)
    bias = make_attention_bias(jnp.asarray(mask))
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention_tpu(q, k, v, bias, block_q=16, block_k=16,
                              interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_flash_backward_matches_xla():
    q, k, v = _qkv(Sq=24, Skv=24, seed=7)
    mask = np.ones((2, 24), np.int32)
    mask[1, 18:] = 0
    pos = jnp.broadcast_to(jnp.arange(24), (2, 24))
    bias = make_attention_bias(jnp.asarray(mask), causal=True,
                               q_positions=pos, kv_positions=pos)

    def loss_flash(q, k, v):
        o = flash_attention_tpu(q, k, v, bias, block_q=8, block_k=8,
                                interpret=True)
        # mask padded rows out of the loss like a real LM loss would
        m = jnp.asarray(mask)[:, None, :, None]
        return jnp.sum(jnp.square(o * m))

    def loss_xla(q, k, v):
        o = _xla_attention(q, k, v, bias)
        m = jnp.asarray(mask)[:, None, :, None]
        return jnp.sum(jnp.square(o * m))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_flash_backward_bidirectional_ragged():
    q, k, v = _qkv(Sq=20, Skv=33, seed=9)
    mask = np.ones((2, 33), np.int32)
    mask[0, 30:] = 0
    bias = make_attention_bias(jnp.asarray(mask))

    def loss_flash(q, k, v):
        o = flash_attention_tpu(q, k, v, bias, block_q=8, block_k=16,
                                interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, bias)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_cache_slot_write_interpret():
    from prot2text_tpu.kernels.cache_update import (
        cache_slot_write, supports_inplace,
    )

    assert supports_inplace((2, 8, 2, 4, 16))      # 2*4*16 = 128
    assert not supports_inplace((2, 8, 2, 4, 15))
    L, T, B, H, D = 2, 8, 2, 4, 16
    cache = jnp.asarray(
        np.random.default_rng(0).standard_normal((L, T, B, H, D)),
        jnp.float32)
    new = jnp.asarray(
        np.random.default_rng(1).standard_normal((L, B, H, D)), jnp.float32)
    ref = np.asarray(cache).copy()   # before the call — the input donates
    ref[:, 5] = np.asarray(new)
    out = np.asarray(cache_slot_write(cache, new, 5, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_cache_slot_write_kv_interpret():
    from prot2text_tpu.kernels.cache_update import cache_slot_write_kv

    L, T, B, H, D = 2, 8, 2, 4, 16
    rng = np.random.default_rng(2)
    ck = jnp.asarray(rng.standard_normal((L, T, B, H, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, T, B, H, D)), jnp.float32)
    nk = jnp.asarray(rng.standard_normal((L, B, H, D)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((L, B, H, D)), jnp.float32)
    ref_k = np.asarray(ck).copy(); ref_k[:, 3] = np.asarray(nk)
    ref_v = np.asarray(cv).copy(); ref_v[:, 3] = np.asarray(nv)
    ok, ov = cache_slot_write_kv(ck, cv, nk, nv, 3, interpret=True)
    np.testing.assert_array_equal(np.asarray(ok), ref_k)
    np.testing.assert_array_equal(np.asarray(ov), ref_v)


def test_flash_masked_matches_xla_bidirectional():
    q, k, v = _qkv(Sq=40, Skv=40, seed=11)
    mask = np.ones((2, 40), np.int32)
    mask[1, 25:] = 0   # right padding: start 0, len 25
    bias = make_attention_bias(jnp.asarray(mask))
    ref = _xla_attention(q, k, v, bias)
    from prot2text_tpu.kernels.flash_attention import flash_attention_masked

    out = flash_attention_masked(
        q, k, v, kv_start=jnp.zeros(2, jnp.int32),
        kv_len=jnp.asarray(mask.sum(1)), block_q=16, block_k=16,
        interpret=True)
    valid_q = np.ones((2, 40), bool)
    o = np.asarray(out).transpose(0, 2, 1, 3)[valid_q]
    r = np.asarray(ref).transpose(0, 2, 1, 3)[valid_q]
    np.testing.assert_allclose(o, r, atol=2e-5, rtol=2e-5)


def test_flash_masked_causal_left_padded():
    q, k, v = _qkv(Sq=24, Skv=24, seed=12)
    mask = np.ones((2, 24), np.int32)
    mask[0, :6] = 0    # left padding: start 6, len 18
    pos = jnp.broadcast_to(jnp.arange(24), (2, 24))
    bias = make_attention_bias(jnp.asarray(mask), causal=True,
                               q_positions=pos, kv_positions=pos)
    ref = _xla_attention(q, k, v, bias)
    from prot2text_tpu.kernels.flash_attention import flash_attention_masked

    starts = jnp.asarray([6, 0], jnp.int32)
    lens = jnp.asarray([18, 24], jnp.int32)
    out = flash_attention_masked(q, k, v, kv_start=starts, kv_len=lens,
                                 causal=True, block_q=8, block_k=8,
                                 interpret=True)
    valid = np.asarray(mask).astype(bool)
    o = np.asarray(out).transpose(0, 2, 1, 3)[valid]
    r = np.asarray(ref).transpose(0, 2, 1, 3)[valid]
    np.testing.assert_allclose(o, r, atol=2e-5, rtol=2e-5)


def test_flash_masked_backward_matches_xla():
    from prot2text_tpu.kernels.flash_attention import flash_attention_masked

    q, k, v = _qkv(Sq=24, Skv=24, seed=21)
    mask = np.ones((2, 24), np.int32)
    mask[0, :6] = 0
    pos = jnp.broadcast_to(jnp.arange(24), (2, 24))
    bias = make_attention_bias(jnp.asarray(mask), causal=True,
                               q_positions=pos, kv_positions=pos)
    starts = jnp.asarray([6, 0], jnp.int32)
    lens = jnp.asarray([18, 24], jnp.int32)
    mm = jnp.asarray(mask)[:, None, :, None]

    def loss_masked(q, k, v):
        o = flash_attention_masked(q, k, v, starts, lens, causal=True,
                                   block_q=8, block_k=8, interpret=True)
        return jnp.sum(jnp.square(o * mm))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(_xla_attention(q, k, v, bias) * mm))

    gm = jax.grad(loss_masked, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gm, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_flash_masked_backward_bounded_with_unmasked_cotangent():
    """Regression: rows with ZERO valid keys (left padding + causal) used to
    make the backward spray cotangent into every key slot (fwd lse for an
    empty row degenerates to NEG_INF + log(l), which fp32 absorbs, so bwd
    p = exp(logits - lse) became 1 everywhere) — gradients compounded ~x512
    per layer through the decoder scan.  With p explicitly masked, empty
    rows output exactly 0 and contribute exactly zero gradient, and the
    valid-row gradients still match XLA."""
    from prot2text_tpu.kernels.flash_attention import flash_attention_masked

    q, k, v = _qkv(Sq=24, Skv=24, seed=33)
    mask = np.ones((2, 24), np.int32)
    mask[0, :6] = 0     # rows 0..5 of batch 0 have no valid keys (causal)
    pos = jnp.broadcast_to(jnp.arange(24), (2, 24))
    bias = make_attention_bias(jnp.asarray(mask), causal=True,
                               q_positions=pos, kv_positions=pos)
    starts = jnp.asarray([6, 0], jnp.int32)
    lens = jnp.asarray([18, 24], jnp.int32)

    def loss_masked(q, k, v):   # cotangent NOT masked — every row contributes
        o = flash_attention_masked(q, k, v, starts, lens, causal=True,
                                   block_q=8, block_k=8, interpret=True)
        return jnp.sum(jnp.square(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(_xla_attention(q, k, v, bias)))

    out = flash_attention_masked(q, k, v, starts, lens, causal=True,
                                 block_q=8, block_k=8, interpret=True)
    # empty rows output exactly zero
    np.testing.assert_array_equal(np.asarray(out)[0, :, :6], 0.0)

    gm = jax.grad(loss_masked, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, name in zip(gm, "qkv"):
        a = np.asarray(a)
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() < 50, (name, np.abs(a).max())
    # dq at empty rows is exactly zero (XLA gives garbage-through-uniform)
    np.testing.assert_array_equal(np.asarray(gm[0])[0, :, :6], 0.0)
    # valid-row q-gradients match XLA (k/v grads differ only by XLA's
    # spurious empty-row uniform contributions, which flash now drops)
    np.testing.assert_allclose(np.asarray(gm[0])[0, :, 6:],
                               np.asarray(gx[0])[0, :, 6:],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gm[0])[1], np.asarray(gx[0])[1],
                               atol=2e-4, rtol=2e-4)


def test_chunked_xla_matches_plain():
    """_xla_attention_chunked is per-row identical math to _xla_attention;
    non-multiple Sq exercises the internal pad+slice (desc-hour prefill is
    Sq=544, chunk=128)."""
    from prot2text_tpu.kernels.attention import _xla_attention_chunked

    q, k, v = _qkv(B=2, H=3, Sq=37, Skv=50, D=16, seed=3)
    mask = np.ones((2, 50), np.int32)
    mask[1, 40:] = 0  # padded keys → -inf bias columns survive chunking
    bias = make_attention_bias(jnp.asarray(mask))
    ref = _xla_attention(q, k, v, bias)
    out = _xla_attention_chunked(q, k, v, bias, chunk=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    # Sq <= chunk short-circuits to the plain path
    out2 = _xla_attention_chunked(q, k, v, bias, chunk=64)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_chunked_xla_bias_variants():
    """The chunked path has two bias branches: a query-invariant
    (B, Hb, 1, Skv) bias rides loop-invariant (never broadcast over Sq),
    while a real-Sq bias (causal prefill) is chunked in its own
    batch/head dims — incl. per-head (Hb=Hq) and broadcast-batch (Bb=1)
    biases, which must NOT be materialized at (B, Hq, Sq, Skv) fp32."""
    from prot2text_tpu.kernels.attention import (
        _xla_attention, _xla_attention_chunked)

    q, k, v = _qkv(B=2, H=3, Sq=37, Skv=50, D=16, seed=5)
    rng = np.random.default_rng(5)
    for shape in ((2, 1, 37, 50),   # causal-style real-Sq bias
                  (2, 3, 37, 50),   # per-head real-Sq bias
                  (1, 3, 37, 50),   # broadcast batch dim
                  (2, 3, 1, 50)):   # query-invariant per-head bias
        bias = jnp.asarray(
            np.where(rng.random(shape) < 0.15, -1e9, 0.0), jnp.float32)
        ref = _xla_attention(q, k, v, bias)
        out = _xla_attention_chunked(q, k, v, bias, chunk=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


def test_masked_flash_padded_non_tileable():
    """masked_flash_padded pads a non-128-tileable prefill (the desc-hour
    S=544 shape, scaled down) onto the flash block grid: padded keys are
    excluded by kv_len, padded query rows attend to the valid run (no NaN),
    and the slice drops them.  Parity vs XLA on the valid rows."""
    from prot2text_tpu.kernels.attention import masked_flash_padded

    q, k, v = _qkv(Sq=90, Skv=90, seed=31)
    mask = np.ones((2, 90), np.int32)
    mask[0, :7] = 0    # left padding: start 7, len 83
    mask[1, 60:] = 0   # right padding: start 0, len 60
    pos = jnp.broadcast_to(jnp.arange(90), (2, 90))
    bias = make_attention_bias(jnp.asarray(mask), causal=True,
                               q_positions=pos, kv_positions=pos)
    ref = _xla_attention(q, k, v, bias)
    starts = jnp.asarray([7, 0], jnp.int32)
    lens = jnp.asarray([83, 60], jnp.int32)
    out = masked_flash_padded(q, k, v, starts, lens, causal=True,
                              interpret=True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
    valid = np.asarray(mask).astype(bool)
    o = np.asarray(out).transpose(0, 2, 1, 3)[valid]
    r = np.asarray(ref).transpose(0, 2, 1, 3)[valid]
    np.testing.assert_allclose(o, r, atol=2e-5, rtol=2e-5)
