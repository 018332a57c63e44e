"""RGCN conv vs a numpy oracle of torch_geometric's RGCNConv (mean aggr).

The reference's RgcnConvLayer subclasses RGCNConv
(modeling_esm2rgcn2llama_instruct.py:58-170); semantics:
  out_i = x_i @ W_root + bias + Σ_r mean_{j∈N_r(i)} x_j @ W_r
"""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from prot2text_tpu.kernels.rgcn import rgcn_conv
from prot2text_tpu.models.adapters import (
    RgcnAdapterConfig, init_rgcn_adapter_params, node_mask_from_attention,
    rgcn_adapter,
)


def _oracle(x, edge_index, edge_type, edge_mask, Wr, Wroot, b):
    N, D = x.shape
    R = Wr.shape[0]
    out = x @ Wroot + b
    for r in range(R):
        agg = np.zeros((N, D), np.float64)
        cnt = np.zeros((N,), np.float64)
        for e in range(edge_index.shape[1]):
            if edge_mask[e] and edge_type[e] == r:
                agg[edge_index[1, e]] += x[edge_index[0, e]]
                cnt[edge_index[1, e]] += 1
        agg = agg / np.maximum(cnt, 1)[:, None]
        out = out + agg @ Wr[r]
    return out


def test_rgcn_conv_matches_oracle():
    rng = np.random.default_rng(0)
    N, D, R, E = 12, 8, 3, 40
    x = rng.standard_normal((N, D)).astype(np.float32)
    ei = rng.integers(0, N, (2, E))
    et = rng.integers(0, R, (E,))
    em = (rng.random(E) > 0.3).astype(np.int32)
    Wr = rng.standard_normal((R, D, D)).astype(np.float32) * 0.1
    Wroot = rng.standard_normal((D, D)).astype(np.float32) * 0.1
    b = rng.standard_normal((D,)).astype(np.float32) * 0.1

    out = rgcn_conv(
        jnp.asarray(x), jnp.asarray(ei), jnp.asarray(et), jnp.asarray(em),
        rel_kernel=jnp.asarray(Wr), root_kernel=jnp.asarray(Wroot),
        bias=jnp.asarray(b))
    ref = _oracle(x.astype(np.float64), ei, et, em,
                  Wr.astype(np.float64), Wroot.astype(np.float64),
                  b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_node_mask_excludes_bos_eos():
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    nm = np.asarray(node_mask_from_attention(jnp.asarray(mask)))
    # row 0: tokens 0..3 valid, bos=0, eos=3 → nodes {1, 2}
    assert nm[0].tolist() == [False, True, True, False, False, False]
    # row 1: all 6 valid, bos=0, eos=5 → nodes 1..4
    assert nm[1].tolist() == [False, True, True, True, True, False]


def test_rgcn_adapter_shapes_and_norm():
    cfg = RgcnAdapterConfig(input_dim=16, intermediate_dim=24, output_dim=8,
                            n_relations=3, n_layers=2)
    params = init_rgcn_adapter_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    B, S = 2, 6
    h = rng.standard_normal((B, S, 16)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    # edges between node positions in flat (B*S) space: row 0 nodes at 1,2
    ei = np.array([[1, 2, 7, 8], [2, 1, 8, 9]])
    et = np.array([0, 1, 2, 0])
    em = np.ones(4, np.int32)
    out = rgcn_adapter(cfg, params, jnp.asarray(h), jnp.asarray(mask),
                       jnp.asarray(ei), jnp.asarray(et), jnp.asarray(em))
    out = np.asarray(out)
    assert out.shape == (B, S, 8)
    # every token L2-normalized
    norms = np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_rgcn_conv_basis_decomposition_matches_oracle():
    """num_bases: W_r = sum_b comp[r, b] * basis[b]
    (reference modeling_esm2rgcn2llama_instruct.py:85-89)."""
    rng = np.random.default_rng(2)
    N, D, R, B, E = 12, 8, 3, 2, 40
    x = rng.standard_normal((N, D)).astype(np.float32)
    ei = rng.integers(0, N, (2, E))
    et = rng.integers(0, R, (E,))
    em = (rng.random(E) > 0.3).astype(np.int32)
    basis = rng.standard_normal((B, D, D)).astype(np.float32) * 0.1
    comp = rng.standard_normal((R, B)).astype(np.float32)
    Wroot = rng.standard_normal((D, D)).astype(np.float32) * 0.1
    b = rng.standard_normal((D,)).astype(np.float32) * 0.1

    out = rgcn_conv(
        jnp.asarray(x), jnp.asarray(ei), jnp.asarray(et), jnp.asarray(em),
        rel_kernel=jnp.asarray(basis), root_kernel=jnp.asarray(Wroot),
        bias=jnp.asarray(b), comp=jnp.asarray(comp))
    Wr = np.einsum("rb,bde->rde", comp, basis)
    ref = _oracle(x.astype(np.float64), ei, et, em,
                  Wr.astype(np.float64), Wroot.astype(np.float64),
                  b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_rgcn_conv_block_diagonal_matches_oracle():
    """num_blocks: W_r block-diagonal (R, nb, D/nb, D/nb)
    (reference modeling_esm2rgcn2llama_instruct.py:90-100)."""
    rng = np.random.default_rng(3)
    N, D, R, nb, E = 12, 8, 3, 2, 40
    x = rng.standard_normal((N, D)).astype(np.float32)
    ei = rng.integers(0, N, (2, E))
    et = rng.integers(0, R, (E,))
    em = (rng.random(E) > 0.3).astype(np.int32)
    blocks = rng.standard_normal((R, nb, D // nb, D // nb)).astype(
        np.float32) * 0.1
    Wroot = rng.standard_normal((D, D)).astype(np.float32) * 0.1
    b = rng.standard_normal((D,)).astype(np.float32) * 0.1

    out = rgcn_conv(
        jnp.asarray(x), jnp.asarray(ei), jnp.asarray(et), jnp.asarray(em),
        rel_kernel=jnp.asarray(blocks), root_kernel=jnp.asarray(Wroot),
        bias=jnp.asarray(b))
    # oracle: materialize the block-diagonal (R, D, D) weights
    Wr = np.zeros((R, D, D), np.float64)
    d = D // nb
    for r in range(R):
        for k in range(nb):
            Wr[r, k * d:(k + 1) * d, k * d:(k + 1) * d] = blocks[r, k]
    ref = _oracle(x.astype(np.float64), ei, et, em, Wr,
                  Wroot.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_rgcn_adapter_decomposition_configs():
    """Adapter init + forward under num_bases / num_blocks configs."""
    rng = np.random.default_rng(4)
    B, S, E = 2, 10, 30
    for kw in ({"num_bases": 2}, {"num_blocks": 4}):
        cfg = RgcnAdapterConfig(input_dim=16, intermediate_dim=24,
                                output_dim=8, n_relations=3, n_layers=2, **kw)
        params = init_rgcn_adapter_params(cfg, jax.random.PRNGKey(0))
        h = jnp.asarray(rng.standard_normal((B, S, 16)), jnp.float32)
        mask = jnp.ones((B, S), jnp.int32)
        ei = jnp.asarray(rng.integers(0, B * S, (2, E)), jnp.int32)
        et = jnp.asarray(rng.integers(0, 3, (E,)), jnp.int32)
        em = jnp.ones((E,), jnp.int32)
        out = rgcn_adapter(cfg, params, h, mask, ei, et, em)
        assert out.shape == (B, S, 8)
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    import pytest

    with pytest.raises(ValueError):
        init_rgcn_adapter_params(
            RgcnAdapterConfig(16, 24, 8, num_bases=2, num_blocks=2),
            jax.random.PRNGKey(0))
