"""Ring attention (sequence-parallel) vs single-device XLA attention.

Runs on the 8-virtual-device CPU mesh (conftest).  The oracle is the
repo's own `_xla_attention` with an equivalent additive bias — exact
numerics are expected up to fp32 reduction-order noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from prot2text_tpu.kernels.attention import _xla_attention
from prot2text_tpu.kernels.ring_attention import ring_attention

B, H, S, D = 2, 4, 64, 16


def _mesh(n, name="sp"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def _bias(kv_start, kv_len, causal):
    rows = jnp.arange(S)
    cols = jnp.arange(S)
    ok = jnp.logical_and(cols[None, :] >= kv_start[:, None],
                         cols[None, :] < (kv_start + kv_len)[:, None])
    ok = ok[:, None, None, :]
    if causal:
        ok = jnp.logical_and(ok, (cols[None, :] <= rows[:, None])[None, None])
    ok = jnp.broadcast_to(ok, (B, 1, S, S))
    return jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)


def _qkv(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    return q, k, v


def _defined_rows(kv_start, kv_len, causal):
    """(B, S) bool — rows with >=1 valid key.  Fully-masked rows (query
    padding) are undefined: the XLA oracle's all-(-inf) softmax degenerates
    to a uniform average while ring attention returns zeros; neither value
    is ever consumed (covered by test_ring_zero_valid_row_is_finite)."""
    rows = jnp.arange(S)[None, :]
    last_valid = (kv_start + kv_len - 1)[:, None]
    ok = kv_len[:, None] > 0
    if causal:
        ok = jnp.logical_and(ok, rows >= kv_start[:, None])
        del last_valid
    return np.asarray(ok)


@pytest.mark.parametrize("n", [2, 4, 8])
@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_xla(n, causal):
    q, k, v = _qkv()
    kv_start = jnp.asarray([3, 0], jnp.int32)      # left padding row 0
    kv_len = jnp.asarray([S - 3, S - 5], jnp.int32)
    scale = D ** -0.5

    ref = np.asarray(
        _xla_attention(q * scale, k, v, _bias(kv_start, kv_len, causal)))
    out = np.asarray(
        ring_attention(q, k, v, mesh=_mesh(n), kv_start=kv_start,
                       kv_len=kv_len, causal=causal))
    ok = _defined_rows(kv_start, kv_len, causal)    # (B, S)
    sel = np.broadcast_to(ok[:, None, :, None], out.shape)
    np.testing.assert_allclose(out[sel], ref[sel], rtol=2e-5, atol=2e-5)


def test_ring_default_full_validity():
    q, k, v = _qkv(1)
    scale = D ** -0.5
    full = _bias(jnp.zeros((B,), jnp.int32), jnp.full((B,), S, jnp.int32),
                 True)
    ref = _xla_attention(q * scale, k, v, full)
    out = ring_attention(q, k, v, mesh=_mesh(4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("remat", [True, False])
@pytest.mark.slow
def test_ring_gradients_match(remat):
    q, k, v = _qkv(2)
    kv_start = jnp.asarray([0, 2], jnp.int32)
    kv_len = jnp.asarray([S, S - 2], jnp.int32)
    scale = D ** -0.5
    mesh = _mesh(4)
    # exclude undefined (zero-valid-key) rows from the loss — see
    # _defined_rows; grads through them differ by construction
    sel = jnp.asarray(_defined_rows(kv_start, kv_len, True))[:, None, :, None]

    def loss_ring(q, k, v):
        o = ring_attention(q, k, v, mesh=mesh, kv_start=kv_start,
                           kv_len=kv_len, causal=True, remat=remat)
        return (o * jnp.cos(o) * sel).sum()

    def loss_ref(q, k, v):
        o = _xla_attention(q * scale, k, v, _bias(kv_start, kv_len, True))
        return (o * jnp.cos(o) * sel).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_ring_zero_valid_row_is_finite():
    """A row whose kv_len is 0 must produce zeros (and finite grads), the
    flash-kernel regression class from round 2 (REPORT_r2.md item 6)."""
    q, k, v = _qkv(3)
    kv_start = jnp.asarray([0, 0], jnp.int32)
    kv_len = jnp.asarray([0, S], jnp.int32)   # row 0: nothing valid
    mesh = _mesh(2)

    out = ring_attention(q, k, v, mesh=mesh, kv_start=kv_start,
                         kv_len=kv_len, causal=False)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[0], 0.0)

    g = jax.grad(lambda q: ring_attention(
        q, k, v, mesh=mesh, kv_start=kv_start, kv_len=kv_len,
        causal=False).sum())(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_ring_rejects_indivisible_sequence():
    q, k, v = _qkv(4)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q[:, :, : S - 1], k[:, :, : S - 1], v[:, :, : S - 1],
                       mesh=_mesh(8))


def test_ring_under_jit_with_batch_axis():
    """jit + 2-axis mesh: batch over dp, sequence over sp."""
    q, k, v = _qkv(5)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    scale = D ** -0.5
    full = _bias(jnp.zeros((B,), jnp.int32), jnp.full((B,), S, jnp.int32),
                 True)
    ref = _xla_attention(q * scale, k, v, full)

    fn = jax.jit(lambda q, k, v: ring_attention(
        q, k, v, mesh=mesh, axis_name="sp", batch_axis="dp"))
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_with_tensor_parallel_heads():
    """tp-sharded heads compose with the sequence ring: (tp=2, sp=4) mesh,
    H=4 heads split over tp, S=64 over sp."""
    q, k, v = _qkv(6)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("tp", "sp"))
    scale = D ** -0.5
    full = _bias(jnp.zeros((B,), jnp.int32), jnp.full((B,), S, jnp.int32),
                 True)
    ref = _xla_attention(q * scale, k, v, full)
    out = jax.jit(lambda q, k, v: ring_attention(
        q, k, v, mesh=mesh, axis_name="sp", head_axis="tp"))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
