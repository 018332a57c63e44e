"""Streaming quantized matmul kernels (kernels/quant_matmul.py).

Interpret-mode Pallas vs the XLA fallback (same numerics contract), the
nibble pack/unpack roundtrip, row padding, and the end-to-end int4 decoder
forward vs an int8 twin of the same quantization grid.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prot2text_tpu.kernels.quant_matmul import (
    pack_int4, quant_matmul_int4, quant_matmul_int4_xla, quant_matmul_int8,
    quant_matmul_int8_xla, supports_quant_matmul, unpack_int4,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for shape in ((64, 32), (3, 64, 32)):
        q = rng.integers(-8, 8, shape).astype(np.int8)
        pk = pack_int4(jnp.asarray(q))
        assert pk.shape == shape[:-2] + (shape[-2] // 2, shape[-1])
        assert pk.dtype == jnp.int8
        assert np.array_equal(np.asarray(unpack_int4(pk)), q)


def test_int8_kernel_matches_xla():
    rng = np.random.default_rng(1)
    K, N, R = 256, 384, 16
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.001, 0.02, (1, N)), jnp.float32)
    ref = quant_matmul_int8_xla(x, w, s)
    out = quant_matmul_int8(x, w, s, interpret=True)
    # products/accumulation are fp32 in both; allow 1-ulp bf16 output
    # differences from reduction order
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_int4_kernel_matches_xla_and_dense():
    rng = np.random.default_rng(2)
    K, N, R = 256, 384, 16
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    pk = pack_int4(jnp.asarray(q))
    s = jnp.asarray(rng.uniform(0.001, 0.02, (1, N)), jnp.float32)
    ref = quant_matmul_int4_xla(x, pk, s)
    out = quant_matmul_int4(x, pk, s, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)
    # against a dense fp32 oracle of the dequantized weights
    dense = (np.asarray(x, np.float32) @ q.astype(np.float32)) * np.asarray(s)
    np.testing.assert_allclose(np.asarray(out, np.float32), dense,
                               rtol=0.02, atol=0.02)


@pytest.mark.parametrize("rows", [1, 5, 16, 17])
def test_row_padding(rows):
    rng = np.random.default_rng(3)
    K, N = 128, 256
    x = jnp.asarray(rng.standard_normal((rows, K)), jnp.bfloat16)
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    pk = pack_int4(jnp.asarray(q))
    s = jnp.full((1, N), 0.01, jnp.float32)
    out = quant_matmul_int4(x, pk, s, interpret=True)
    assert out.shape == (rows, N)
    ref = quant_matmul_int4_xla(x, pk, s)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_supports_gate():
    assert supports_quant_matmul(4096, 14336, bits=4)
    assert supports_quant_matmul(4096, 128256, bits=8)   # N = 1002 * 128
    assert not supports_quant_matmul(100, 14336, bits=4)
    assert not supports_quant_matmul(4096, 100, bits=8)


def test_int4_decoder_forward_close_to_int8():
    """End-to-end: the packed int4 path through decoder_forward stays within
    the expected quantization-noise ballpark of the int8 path."""
    from prot2text_tpu.models.decoder import (
        causal_bias_from_mask, decoder_forward, embed_tokens,
        init_decoder_params,
    )
    from prot2text_tpu.models.llama import LlamaConfig
    from prot2text_tpu.models.quant import quantize_params

    cfg = LlamaConfig.tiny(vocab_size=128).core()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    q4 = quantize_params(params, bits=4)
    q8 = quantize_params(params, bits=8)
    ids = np.random.default_rng(1).integers(0, 128, (2, 8))
    emb = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.ones((2, 8), jnp.int32))
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    h4, _ = decoder_forward(cfg, q4, inputs_embeds=emb, bias=bias,
                            positions=pos)
    h8, _ = decoder_forward(cfg, q8, inputs_embeds=emb, bias=bias,
                            positions=pos)
    rel = np.abs(np.asarray(h4) - np.asarray(h8)).max() / (
        np.abs(np.asarray(h8)).max() + 1e-9)
    assert rel < 0.35, rel


def test_stacked_kernels_match_per_layer():
    """Scalar-prefetch stacked variants vs the per-layer kernels: exact
    (same block structure → identical fp32 accumulation order)."""
    from prot2text_tpu.kernels.quant_matmul import (
        quant_matmul_int4_stacked, quant_matmul_int8_stacked,
    )

    rng = np.random.default_rng(3)
    L, K, N, R = 3, 256, 384, 16
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    q = rng.integers(-8, 8, (L, K, N)).astype(np.int8)
    pk = pack_int4(jnp.asarray(q))
    w8 = jnp.asarray(rng.integers(-127, 128, (L, K, N)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.001, 0.02, (L, 1, N)), jnp.float32)
    for li in range(L):
        a4 = quant_matmul_int4(x, pk[li], s[li], interpret=True)
        b4 = quant_matmul_int4_stacked(x, pk, s, li, interpret=True)
        np.testing.assert_array_equal(np.asarray(a4), np.asarray(b4))
        a8 = quant_matmul_int8(x, w8[li], s[li], interpret=True)
        b8 = quant_matmul_int8_stacked(x, w8, s, li, interpret=True)
        np.testing.assert_array_equal(np.asarray(a8), np.asarray(b8))


def test_stacked_int4_under_scan_with_traced_index():
    """The decode-step usage: layer index is a traced scan variable."""
    from prot2text_tpu.kernels.quant_matmul import quant_matmul_int4_stacked

    rng = np.random.default_rng(4)
    L, K, N, R = 4, 128, 256, 8
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    q = rng.integers(-8, 8, (L, K, N)).astype(np.int8)
    pk = pack_int4(jnp.asarray(q))
    s = jnp.full((L, 1, N), 0.01, jnp.float32)

    def body(c, li):
        y = quant_matmul_int4_stacked(c, pk, s, li, interpret=True)
        return (y[:, :K] * 0.01 + c).astype(jnp.bfloat16), y

    _, ys = jax.lax.scan(body, x, jnp.arange(L))
    # per-layer reference chain
    c = x
    for li in range(L):
        y = quant_matmul_int4(c, pk[li], s[li], interpret=True)
        np.testing.assert_array_equal(np.asarray(ys[li]), np.asarray(y))
        c = (y[:, :K] * 0.01 + c).astype(jnp.bfloat16)
