"""attn_impl="ring" wired through the decoder + SFT step on a dp×sp mesh.

Ring attention is a long-context extension beyond the reference; these
tests prove it is WIRED (not just a kernel): decoder_forward under
jax.set_mesh on a (dp=2, sp=4) mesh matches the single-impl XLA forward,
and the full jitted SFT train step produces the same loss/grads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prot2text_tpu.core.mesh import MeshConfig, make_mesh
from prot2text_tpu.models.decoder import (
    DecoderConfig, causal_bias_from_mask, contiguous_lengths,
    decoder_forward, init_decoder_params,
)

CFG = DecoderConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
    num_kv_heads=2, intermediate_size=64, head_dim=8, rope_theta=10000.0)
B, S = 4, 64


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.standard_normal((B, S, CFG.hidden_size)),
                      jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, :5] = 0                                # left padding row 0
    mask = jnp.asarray(mask)
    return emb, mask


def test_decoder_forward_ring_matches_xla():
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    emb, mask = _batch()
    bias = causal_bias_from_mask(mask)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    lengths = contiguous_lengths(mask)

    ref, _ = decoder_forward(CFG, params, inputs_embeds=emb, bias=bias,
                             positions=positions, attn_impl="xla",
                             attn_lengths=lengths)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, sp=4))
    with jax.set_mesh(mesh):
        out, _ = jax.jit(
            lambda p, e: decoder_forward(
                CFG, p, inputs_embeds=e, bias=bias, positions=positions,
                attn_impl="ring", attn_lengths=lengths))(params, emb)
    # rows with attention_mask=0 are query padding (undefined under the
    # all-masked softmax) — compare valid rows
    sel = np.asarray(mask, bool)[:, :, None]
    sel = np.broadcast_to(sel, ref.shape)
    np.testing.assert_allclose(np.asarray(out)[sel], np.asarray(ref)[sel],
                               rtol=2e-5, atol=2e-5)


def test_decoder_ring_gradients_match_xla():
    params = init_decoder_params(CFG, jax.random.PRNGKey(1))
    emb, mask = _batch(1)
    bias = causal_bias_from_mask(mask)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    lengths = contiguous_lengths(mask)
    sel = jnp.asarray(np.asarray(mask, np.float32))[:, :, None]

    def loss(p, impl):
        h, _ = decoder_forward(CFG, p, inputs_embeds=emb, bias=bias,
                               positions=positions, attn_impl=impl,
                               attn_lengths=lengths)
        return ((h * sel) ** 2).mean()

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, sp=4))
    with jax.set_mesh(mesh):
        g_ring = jax.jit(jax.grad(lambda p: loss(p, "ring")))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_ring = jax.tree_util.tree_leaves(g_ring)
    for (path, a), b in zip(flat_ref, flat_ring):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


def test_decoder_ring_with_cache_falls_back():
    """Generation prefill (kv_cache present) silently uses XLA under ring."""
    from prot2text_tpu.infer.kvcache import init_kv_cache

    params = init_decoder_params(CFG, jax.random.PRNGKey(2))
    emb, mask = _batch(2)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    cache = init_kv_cache(CFG, B, S + 4, jnp.float32)
    from prot2text_tpu.infer.generate import _prefill_bias

    bias = _prefill_bias(mask, S + 4)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, sp=4))
    with jax.set_mesh(mesh):
        h, new_cache = decoder_forward(
            CFG, params, inputs_embeds=emb, bias=bias, positions=positions,
            kv_cache=cache, cache_index=0, attn_impl="ring",
            attn_lengths=contiguous_lengths(mask))
    assert h.shape == (B, S, CFG.hidden_size)
    assert new_cache is not None


@pytest.mark.slow
def test_sft_step_ring_matches_xla_loss():
    """The full jitted SFT train step under --attn_impl ring --sp 4
    (text sequence S=16 rides a 4-device ring; the bidirectional ESMC
    tower silently keeps XLA)."""
    from __graft_entry__ import _batch, _tiny_setup
    from prot2text_tpu.models.lora import LoraConfig, init_lora_params
    from prot2text_tpu.train.optim import adamw_constant
    from prot2text_tpu.train.sft import (
        SFTConfig, TrainState, make_sft_train_step)

    cfg, params = _tiny_setup()
    lcfg = LoraConfig(r=2, alpha=4)
    scfg = SFTConfig(lora=lcfg, placeholder_id=99, remat=False)
    frozen = {k: params[k] for k in ("esm_encoder", "llm_decoder", "adapter")}
    trainable = {
        "lora_esm": init_lora_params(lcfg, params["esm_encoder"],
                                     jax.random.PRNGKey(1)),
        "lora_llm": init_lora_params(lcfg, params["llm_decoder"],
                                     jax.random.PRNGKey(2)),
        "adapter": params["adapter"],
    }
    tx = adamw_constant(1e-3)
    batch = _batch(B=4)

    losses = {}
    for impl in ("xla", "ring"):
        state = TrainState.create(trainable, tx)
        step = jax.jit(make_sft_train_step(
            esm_config=cfg.esm_config, adapter_config=cfg.adapter_config,
            decoder_core=cfg.llm_config.core(), cfg=scfg, tx=tx,
            attn_impl=impl))
        mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=1, sp=4))
        with jax.set_mesh(mesh):
            _, loss = step(state, frozen, batch, jax.random.PRNGKey(0))
        losses[impl] = float(loss)
    assert np.isfinite(losses["ring"])
    np.testing.assert_allclose(losses["ring"], losses["xla"], rtol=2e-5)
