"""SPMD correctness: the jitted train step computes the SAME loss and update
on 1 device and on an 8-device (dp×fsdp×tp) mesh — the property that replaces
DDP's gradient all-reduce correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from prot2text_tpu.core import MeshConfig, make_mesh
from prot2text_tpu.core.partition import DEFAULT_RULES, shard_params
from prot2text_tpu.models.adapters import (
    ModalityAdapterConfig, init_modality_adapter_params,
)
from prot2text_tpu.models.esmc import ESMCConfig, init_esmc_params
from prot2text_tpu.models.qwen3 import Qwen3Config, init_qwen3_params
from prot2text_tpu.train.contrastive import (
    ContrastiveConfig, make_contrastive_train_step,
)
from prot2text_tpu.train.optim import TrainState, adamw_constant


def _setup():
    esm_cfg = ESMCConfig.tiny()
    ad_cfg = ModalityAdapterConfig(64, 48, 64)
    qwen_cfg = Qwen3Config.tiny(vocab_size=128)
    frozen = {
        "esm_encoder": init_esmc_params(esm_cfg, jax.random.PRNGKey(0)),
        "llm_decoder": init_qwen3_params(qwen_cfg, jax.random.PRNGKey(1)),
    }
    adapter = init_modality_adapter_params(ad_cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(0)
    B, Pn, S = 8, 8, 12
    batch = {
        "protein_input_ids": jnp.asarray(
            np.concatenate([np.zeros((B, 1)), rng.integers(4, 24, (B, Pn - 2)),
                            2 * np.ones((B, 1))], axis=1).astype(np.int32)),
        "protein_attention_mask": jnp.ones((B, Pn), jnp.int32),
        "description_input_ids": jnp.asarray(
            rng.integers(0, 128, (B, S)).astype(np.int32)),
        "description_attention_mask": jnp.ones((B, S), jnp.int32),
    }
    ccfg = ContrastiveConfig(num_segments=2, output_llm_layer=1)
    tx = adamw_constant(1e-3)
    step = make_contrastive_train_step(
        esm_config=esm_cfg, adapter_config=ad_cfg,
        decoder_core=qwen_cfg.core(), cfg=ccfg, tx=tx,
        deterministic=True)
    return frozen, adapter, batch, tx, step


def test_loss_identical_across_mesh_layouts():
    frozen, adapter, batch, tx, step = _setup()
    rng = jax.random.PRNGKey(0)

    # single device
    state1 = TrainState.create(adapter, tx)
    s1, loss1 = jax.jit(step)(state1, frozen, batch, rng)

    # 8-device mesh: dp2 × fsdp2 × tp2, params rule-sharded, batch dp-sharded
    mesh = make_mesh(MeshConfig(dp=-1, fsdp=2, tp=2))
    frozen_s = {k: shard_params(v, mesh, DEFAULT_RULES)
                for k, v in frozen.items()}
    repl = NamedSharding(mesh, P())
    adapter_s = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), adapter)
    bspec = NamedSharding(mesh, P(("dp", "fsdp")))
    batch_s = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, bspec), batch)
    state8 = TrainState.create(adapter_s, tx)
    with jax.set_mesh(mesh):
        s8, loss8 = jax.jit(step)(state8, frozen_s, batch_s, rng)

    np.testing.assert_allclose(float(loss1), float(loss8), atol=1e-5)
    # updated adapter params agree
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_generation_identical_under_mesh():
    """KV-cached greedy decode produces the same tokens on 1 device and on a
    dp-sharded 8-device mesh."""
    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.decoder import init_decoder_params
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.tiny(vocab_size=64).core()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, PL = 8, 6
    emb = jnp.asarray(rng.standard_normal((B, PL, cfg.hidden_size))
                      .astype(np.float32))
    mask = jnp.ones((B, PL), jnp.int32)
    gen_cfg = GenerationConfig(max_new_tokens=5, eos_token_id=63,
                               pad_token_id=62)

    t1 = np.asarray(generate(cfg, params, inputs_embeds=emb,
                             attention_mask=mask, gen_cfg=gen_cfg))

    mesh = make_mesh(MeshConfig(dp=-1, fsdp=1, tp=1))
    bspec = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    emb_s = jax.device_put(emb, bspec)
    mask_s = jax.device_put(mask, bspec)
    params_s = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), params)
    with jax.set_mesh(mesh):
        t8 = np.asarray(generate(cfg, params_s, inputs_embeds=emb_s,
                                 attention_mask=mask_s, gen_cfg=gen_cfg))
    np.testing.assert_array_equal(t1, t8)


def test_tp_actually_shards_and_matches():
    """With divisible dims, DEFAULT_RULES place decoder projections on the
    tp/fsdp axes (not silently replicated), and the sharded forward matches
    the replicated one."""
    from prot2text_tpu.models.decoder import (
        DecoderConfig, causal_bias_from_mask, decoder_forward, decoder_logits,
        embed_tokens, init_decoder_params,
    )

    cfg = DecoderConfig(vocab_size=256, hidden_size=64, num_layers=2,
                        num_heads=8, num_kv_heads=4, intermediate_size=128,
                        head_dim=8, rope_theta=10000.0)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(0).integers(0, 256, (4, 10))
    mask = np.ones((4, 10), np.int64)

    emb = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.asarray(mask))
    pos = jnp.broadcast_to(jnp.arange(10), (4, 10))
    h_ref, _ = decoder_forward(cfg, params, inputs_embeds=emb, bias=bias,
                               positions=pos)
    logits_ref = decoder_logits(cfg, params, h_ref)

    mesh = make_mesh(MeshConfig(dp=-1, fsdp=2, tp=2))
    sharded = shard_params(params, mesh, DEFAULT_RULES)
    # q_proj kernel (L, 64, 64): dims divisible by fsdp=2/tp=2 → sharded
    spec = sharded["layers"]["q_proj"]["kernel"].sharding.spec
    assert tuple(spec) == (None, "fsdp", "tp"), spec

    with jax.set_mesh(mesh):
        h_s, _ = jax.jit(
            lambda p, e: decoder_forward(cfg, p, inputs_embeds=e, bias=bias,
                                         positions=pos))(sharded, emb)
        logits_s = decoder_logits(cfg, sharded, h_s)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_ref),
                               atol=2e-5, rtol=2e-5)


def test_partition_rules_fallback_to_replication():
    """Non-divisible dims silently replicate instead of erroring."""
    from prot2text_tpu.core.partition import DEFAULT_RULES

    mesh = make_mesh(MeshConfig(dp=-1, fsdp=2, tp=2))
    # hidden 31 not divisible by 2 → both dims dropped
    spec = DEFAULT_RULES.spec_for("layers/q_proj/kernel", (4, 31, 31), mesh)
    assert tuple(spec) == (None, None, None)
    # mixed: 32 divisible, 31 not
    spec = DEFAULT_RULES.spec_for("layers/q_proj/kernel", (4, 32, 31), mesh)
    assert tuple(spec) == (None, "fsdp", None)


@pytest.mark.slow
def test_serving_engine_under_mesh():
    """ContinuousBatcher produces identical greedy streams on 1 device and
    on an 8-device dp×fsdp×tp mesh with rule-sharded params — the
    tensor-parallel serving configuration (reference serves via HF
    generate() on one GPU, scripts/generate_instruct.py:72-87; here the
    Pallas fused paths gate off under the ambient mesh and the XLA
    fallbacks partition under GSPMD)."""
    from prot2text_tpu.infer.serving import ContinuousBatcher
    from prot2text_tpu.models.decoder import DecoderConfig, init_decoder_params

    cfg = DecoderConfig(vocab_size=256, hidden_size=64, num_layers=2,
                        num_heads=8, num_kv_heads=4, intermediate_size=128,
                        head_dim=8, rope_theta=10000.0)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    reqs = [(i, rng.standard_normal((pl, cfg.hidden_size)).astype(np.float32),
             bu)
            for i, (pl, bu) in enumerate(
                zip((3, 5, 8, 2, 6, 7), (4, 6, 3, 5, 6, 2)))]

    def run(engine_params, **kw):
        eng = ContinuousBatcher(cfg, engine_params, max_slots=4,
                                max_len=8 + 6, prompt_pad=8,
                                eos_token_id=-1, cache_dtype=jnp.float32,
                                **kw)
        for rid, emb, budget in reqs:
            eng.submit(rid, emb, max_new_tokens=budget)
        return {k: list(v) for k, v in eng.run()}

    out1 = run(params)

    mesh = make_mesh(MeshConfig(dp=-1, fsdp=2, tp=2))
    sharded = shard_params(params, mesh, DEFAULT_RULES)
    with jax.set_mesh(mesh):
        out8 = run(sharded)
    assert out1 == out8

    # speculative engine (per-row prompt-lookup drafts, XLA verify fallback
    # under the mesh) is greedy-exact, so the sharded spec streams must
    # also equal the single-device plain streams
    with jax.set_mesh(mesh):
        out8s = run(sharded, prompt_lookup_tokens=2, sync_every=2)
    assert out1 == out8s
