"""Train-step tests: contrastive + SFT + legacy converge/execute, LoRA
semantics, multi-chip dry run on the 8-virtual-device CPU mesh."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from prot2text_tpu.models import (
    ESM2Config, Esm2LlamaConfig, Esm2LlamaForCausalLM, LlamaConfig,
    ModalityAdapterConfig, Qwen3Config,
)
from prot2text_tpu.models.esmc import ESMCConfig
from prot2text_tpu.models.lora import LoraConfig, init_lora_params, merge_lora
from prot2text_tpu.train.contrastive import (
    ContrastiveConfig, batch_infonce_loss, make_contrastive_train_step,
    readout_embeddings, segmented_infonce_loss, text_hidden_at_layer,
)
from prot2text_tpu.train.optim import TrainState, adamw_constant
from prot2text_tpu.train.sft import SFTConfig, make_sft_train_step


def test_infonce_matches_reference_formula():
    rng = np.random.default_rng(0)
    z1 = rng.standard_normal((6, 8)).astype(np.float32)
    z2 = rng.standard_normal((6, 8)).astype(np.float32)
    z1 /= np.linalg.norm(z1, axis=1, keepdims=True)
    z2 /= np.linalg.norm(z2, axis=1, keepdims=True)
    tau = 0.05
    sims = z1 @ z2.T / tau
    expected = -np.mean(
        np.log(np.exp(np.diag(sims)) / np.exp(sims).sum(1)))
    got = float(batch_infonce_loss(jnp.asarray(z1), jnp.asarray(z2), tau))
    assert abs(got - expected) < 1e-4

    # segmented version with offset labels
    seg = z1[2:4]
    labels = np.array([2, 3])
    sims_seg = seg @ z2.T / tau
    expected_seg = -np.mean(np.log(
        np.exp(sims_seg[np.arange(2), labels]) / np.exp(sims_seg).sum(1)))
    got_seg = float(segmented_infonce_loss(
        jnp.asarray(seg), jnp.asarray(z2), jnp.asarray(labels), tau))
    assert abs(got_seg - expected_seg) < 1e-4


def test_readout_mix_matches_reference():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((2, 5, 4)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    out = np.asarray(readout_embeddings(
        jnp.asarray(emb), jnp.asarray(mask), "mix"))
    for b in range(2):
        v = emb[b][mask[b].astype(bool)]
        mean = v.mean(0)
        std = np.sqrt(((v - mean) ** 2).mean(0))
        np.testing.assert_allclose(out[b], np.concatenate([mean, std]),
                                   atol=1e-5)


def test_text_hidden_at_layer_matches_hf():
    import torch
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM

    torch.manual_seed(3)
    hcfg = HFQwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=1000000.0, tie_word_embeddings=False,
        attention_dropout=0.0)
    model = Qwen3ForCausalLM(hcfg).eval()
    from prot2text_tpu.models.hf_import import decoder_params_from_hf

    cfg = Qwen3Config(vocab_size=128, hidden_size=32, num_layers=3,
                      num_heads=4, num_kv_heads=2, head_dim=8,
                      intermediate_size=64, tie_word_embeddings=False)
    params = decoder_params_from_hf(model.state_dict(), 3, qk_norm=True)

    ids = np.random.default_rng(0).integers(0, 128, (2, 7))
    mask = np.ones((2, 7), np.int64)
    with torch.no_grad():
        hs = model.model(torch.tensor(ids), attention_mask=torch.tensor(mask),
                         output_hidden_states=True).hidden_states
    # layer 2 of 3 (pre-final-norm)
    ref = hs[2].numpy()
    got = np.asarray(text_hidden_at_layer(
        cfg.core(), params, jnp.asarray(ids), jnp.asarray(mask), 2))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def _contrastive_setup():
    esm_cfg = ESMCConfig.tiny()
    ad_cfg = ModalityAdapterConfig(64, 48, 64)
    qwen_cfg = Qwen3Config.tiny(vocab_size=128)
    from prot2text_tpu.models.adapters import init_modality_adapter_params
    from prot2text_tpu.models.esmc import init_esmc_params
    from prot2text_tpu.models.qwen3 import init_qwen3_params

    frozen = {
        "esm_encoder": init_esmc_params(esm_cfg, jax.random.PRNGKey(0)),
        "llm_decoder": init_qwen3_params(qwen_cfg, jax.random.PRNGKey(1)),
    }
    adapter = init_modality_adapter_params(ad_cfg, jax.random.PRNGKey(2))
    return esm_cfg, ad_cfg, qwen_cfg, frozen, adapter


def _contrastive_batch(B=4):
    rng = np.random.default_rng(0)
    P, S = 8, 10
    prot_ids = np.full((B, P), 1)
    prot_mask = np.zeros((B, P), np.int32)
    for b in range(B):
        L = 5 + (b % 3)
        prot_ids[b, 0] = 0
        prot_ids[b, 1:L - 1] = rng.integers(4, 24, L - 2)
        prot_ids[b, L - 1] = 2
        prot_mask[b, :L] = 1
    desc = rng.integers(0, 128, (B, S))
    dmask = np.ones((B, S), np.int32)
    return {
        "protein_input_ids": jnp.asarray(prot_ids),
        "protein_attention_mask": jnp.asarray(prot_mask),
        "description_input_ids": jnp.asarray(desc),
        "description_attention_mask": jnp.asarray(dmask),
    }


def test_contrastive_step_decreases_loss():
    esm_cfg, ad_cfg, qwen_cfg, frozen, adapter = _contrastive_setup()
    ccfg = ContrastiveConfig(num_segments=2, output_llm_layer=1)
    tx = adamw_constant(1e-3)
    step = jax.jit(make_contrastive_train_step(
        esm_config=esm_cfg, adapter_config=ad_cfg,
        decoder_core=qwen_cfg.core(), cfg=ccfg, tx=tx))
    state = TrainState.create(adapter, tx)
    batch = _contrastive_batch()
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, frozen, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_lora_zero_init_is_identity_and_merge_changes():
    cfg = Qwen3Config.tiny(vocab_size=64)
    from prot2text_tpu.models.qwen3 import init_qwen3_params

    params = init_qwen3_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=2, alpha=4)
    lora = init_lora_params(lcfg, params, jax.random.PRNGKey(1))
    merged = merge_lora(lcfg, params, lora)
    # B zero-init → merged == base
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # after perturbing B, targeted leaves change
    lora2 = jax.tree_util.tree_map(lambda x: x + 0.1, lora)
    merged2 = merge_lora(lcfg, params, lora2)
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(merged2),
                        jax.tree_util.tree_leaves(params)))
    assert diff > 0


@pytest.mark.slow
def test_sft_step_runs_and_updates_lora_only():
    from __graft_entry__ import _batch, _tiny_setup

    cfg, params = _tiny_setup()
    lcfg = LoraConfig(r=2, alpha=4)
    scfg = SFTConfig(lora=lcfg, placeholder_id=99, remat=False)
    frozen = {"esm_encoder": params["esm_encoder"],
              "llm_decoder": params["llm_decoder"],
              "adapter": params["adapter"]}
    trainable = {
        "lora_esm": init_lora_params(lcfg, params["esm_encoder"],
                                     jax.random.PRNGKey(1)),
        "lora_llm": init_lora_params(lcfg, params["llm_decoder"],
                                     jax.random.PRNGKey(2)),
        "adapter": params["adapter"],
    }
    tx = adamw_constant(1e-3)
    state = TrainState.create(trainable, tx)
    step = jax.jit(make_sft_train_step(
        esm_config=cfg.esm_config, adapter_config=cfg.adapter_config,
        decoder_core=cfg.llm_config.core(), cfg=scfg, tx=tx))
    batch = _batch(B=4)
    state2, loss = step(state, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # LoRA B materially updated
    b_before = jax.tree_util.tree_leaves(state.params["lora_llm"])
    b_after = jax.tree_util.tree_leaves(state2.params["lora_llm"])
    assert any(
        float(jnp.abs(x - y).max()) > 0 for x, y in zip(b_before, b_after))


def test_sft_step_int4_frozen_base():
    """QLoRA over an int4-PACKED frozen decoder — the recipe that fits the
    reference's stage-2 scale (Qwen3-14B, train_instruct.py:87-94) on one
    16 GB chip (int4 base ≈ 7.4 GB vs ~14 GB int8).  LoRA A must take the
    UNPACKED contraction dim (kernel_q4p stores K/8 i32 words) and the
    step must differentiate through the XLA dequant matmuls (round 5)."""
    from __graft_entry__ import _batch, _tiny_setup
    from prot2text_tpu.models.quant import quantize_params

    cfg, params = _tiny_setup()
    qdec = quantize_params(params["llm_decoder"], bits=4)
    # packed format landed (hidden 64 % 8 == 0 → planes)
    q_attn = qdec["layers"]["q_proj"]
    assert "kernel_q4p" in q_attn

    lcfg = LoraConfig(r=2, alpha=4)
    lora_llm = init_lora_params(lcfg, qdec, jax.random.PRNGKey(2))
    # A gets the unpacked K (64), not the packed word dim (8)
    A = lora_llm["layers"]["q_proj"]["kernel_q4p"]["A"]
    assert A.shape[-2] == 64

    frozen = {"esm_encoder": params["esm_encoder"], "llm_decoder": qdec,
              "adapter": params["adapter"]}
    trainable = {
        "lora_esm": init_lora_params(lcfg, params["esm_encoder"],
                                     jax.random.PRNGKey(1)),
        "lora_llm": lora_llm,
        "adapter": params["adapter"],
    }
    tx = adamw_constant(1e-3)
    state = TrainState.create(trainable, tx)
    step = jax.jit(make_sft_train_step(
        esm_config=cfg.esm_config, adapter_config=cfg.adapter_config,
        decoder_core=cfg.llm_config.core(),
        cfg=SFTConfig(lora=lcfg, placeholder_id=99, remat=False), tx=tx))
    state2, loss = step(state, frozen, _batch(B=4), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    b_before = jax.tree_util.tree_leaves(state.params["lora_llm"])
    b_after = jax.tree_util.tree_leaves(state2.params["lora_llm"])
    assert any(
        float(jnp.abs(x - y).max()) > 0 for x, y in zip(b_before, b_after))
    # merging into a quantized base is refused, not silently rounded
    with pytest.raises(ValueError, match="quantized base"):
        merge_lora(lcfg, qdec, lora_llm)


def test_legacy_step_runs():
    cfg = Esm2LlamaConfig(
        esm_config=ESM2Config(hidden_size=32, num_layers=2, num_heads=4,
                              intermediate_size=64),
        llama_config=LlamaConfig.tiny(vocab_size=64),
        decoder_hidden_size=64)
    model = Esm2LlamaForCausalLM(cfg)
    from prot2text_tpu.train.legacy import make_legacy_train_step

    tx = adamw_constant(1e-4, grad_clip=1.0)
    state = TrainState.create(model.params, tx)
    step = jax.jit(make_legacy_train_step(config=cfg, tx=tx, remat=False))
    B, P, S = 2, 8, 6
    batch = {
        "protein_input_ids": jnp.asarray(np.full((B, P), 5)),
        "protein_attention_mask": jnp.ones((B, P), jnp.int32),
        "input_ids": jnp.asarray(np.full((B, S), 9)),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(np.full((B, S), 9)),
    }
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


def test_lora_side_path_equals_merged_forward():
    """decoder_forward(lora=...) ≡ decoder_forward(merge_lora(params))."""
    from prot2text_tpu.models.decoder import (
        causal_bias_from_mask, decoder_forward, embed_tokens,
    )

    cfg = Qwen3Config.tiny(vocab_size=64).core()
    from prot2text_tpu.models.qwen3 import init_qwen3_params

    params = init_qwen3_params(Qwen3Config.tiny(vocab_size=64),
                               jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=3, alpha=6)
    lora = init_lora_params(lcfg, params, jax.random.PRNGKey(1))
    # make B nonzero so the delta is real
    lora = jax.tree_util.tree_map(lambda x: x + 0.05, lora)

    ids = np.random.default_rng(0).integers(0, 64, (2, 7))
    mask = np.ones((2, 7), np.int64)
    emb = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.asarray(mask))
    pos = jnp.broadcast_to(jnp.arange(7), (2, 7))

    h_side, _ = decoder_forward(cfg, params, inputs_embeds=emb, bias=bias,
                                positions=pos, lora=lora,
                                lora_scale=lcfg.scale)
    merged = merge_lora(lcfg, params, lora)
    h_merged, _ = decoder_forward(cfg, merged, inputs_embeds=emb, bias=bias,
                                  positions=pos)
    np.testing.assert_allclose(np.asarray(h_side), np.asarray(h_merged),
                               atol=2e-5, rtol=2e-5)


def test_esmc_lora_side_path_equals_merged():
    from prot2text_tpu.models.esmc import (
        ESMCConfig, esmc_encode, init_esmc_params,
    )

    cfg = ESMCConfig.tiny()
    params = init_esmc_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=2, alpha=4)
    lora = init_lora_params(lcfg, params, jax.random.PRNGKey(1))
    lora = jax.tree_util.tree_map(lambda x: x + 0.05, lora)

    ids = np.random.default_rng(1).integers(4, 24, (2, 9))
    mask = np.ones((2, 9), np.int64)
    h_side = esmc_encode(cfg, params, jnp.asarray(ids), jnp.asarray(mask),
                         lora=lora, lora_scale=lcfg.scale)
    merged = merge_lora(lcfg, params, lora)
    h_merged = esmc_encode(cfg, merged, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(h_side), np.asarray(h_merged),
                               atol=2e-5, rtol=2e-5)


def test_graph_sft_step_trains_rgcn_adapter():
    from prot2text_tpu.models.adapters import (
        RgcnAdapterConfig, init_rgcn_adapter_params,
    )
    from prot2text_tpu.models.esm2 import init_esm2_params
    from prot2text_tpu.models.llama import init_llama_params
    from prot2text_tpu.train.graph_instruct import (
        GraphSFTConfig, make_graph_sft_train_step,
    )

    esm_cfg = ESM2Config(hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64)
    llama_cfg = LlamaConfig.tiny(vocab_size=128)
    ad_cfg = RgcnAdapterConfig(32, 48, 64, n_relations=3, n_layers=2)
    PH = 99

    frozen = {
        "esm_encoder": init_esm2_params(esm_cfg, jax.random.PRNGKey(0)),
        "llama_decoder": init_llama_params(llama_cfg, jax.random.PRNGKey(1)),
    }
    lcfg = LoraConfig(r=2, alpha=4)
    trainable = {
        "adapter": init_rgcn_adapter_params(ad_cfg, jax.random.PRNGKey(2)),
        "lora_llm": init_lora_params(lcfg, frozen["llama_decoder"],
                                     jax.random.PRNGKey(3)),
    }
    tx = adamw_constant(1e-3)
    state = TrainState.create(trainable, tx)
    cfg = GraphSFTConfig(lora=lcfg, placeholder_id=PH, remat=False)
    step = jax.jit(make_graph_sft_train_step(
        esm_config=esm_cfg, adapter_config=ad_cfg,
        decoder_core=llama_cfg.core(), cfg=cfg, tx=tx))

    B, P, S = 2, 8, 14
    prot_ids = np.full((B, P), 1)
    prot_mask = np.zeros((B, P), np.int32)
    ids = np.full((B, S), 7)
    mask = np.ones((B, S), np.int32)
    labels = np.full((B, S), -100)
    for b, L in enumerate([8, 5]):
        prot_ids[b, 0] = 0
        prot_ids[b, 1:L - 1] = 5
        prot_ids[b, L - 1] = 2
        prot_mask[b, :L] = 1
        pad = S - (L + 4)
        ids[b, :pad] = 0
        mask[b, :pad] = 0
        ids[b, pad:pad + 2] = [1, 2]
        ids[b, pad + 2:pad + 2 + L] = PH
        ids[b, pad + 2 + L:] = 3
        labels[b, pad + 2 + L:] = 3
    batch = {
        "protein_input_ids": jnp.asarray(prot_ids),
        "protein_attention_mask": jnp.asarray(prot_mask),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "graph_edge_index": jnp.asarray(np.array([[1, 2, 9], [2, 3, 10]])),
        "graph_edge_type": jnp.asarray(np.array([0, 1, 2])),
        "graph_edge_mask": jnp.asarray(np.ones(3, np.int32)),
    }
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(6):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, frozen, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
