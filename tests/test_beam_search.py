"""Beam search vs HF `generate(num_beams=K)` on a tiny Llama."""

import numpy as np
import pytest

import jax.numpy as jnp

from prot2text_tpu.infer.beam_search import beam_search
from prot2text_tpu.infer.generate import GenerationConfig
from prot2text_tpu.models.hf_import import decoder_params_from_hf
from prot2text_tpu.models.llama import LlamaConfig


@pytest.fixture(scope="module")
def hf_llama():
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    torch.manual_seed(21)
    cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_dropout=0.0, rms_norm_eps=1e-5,
    )
    return LlamaForCausalLM(cfg).eval()


@pytest.mark.parametrize("num_beams,eos", [(3, 9999), (3, 64)])
def test_beam_search_matches_hf(hf_llama, num_beams, eos):
    """eos=9999 → never finishes (pure score race); eos=64 → finishing
    hypotheses exercised."""
    import torch

    model = hf_llama
    cfg = LlamaConfig.tiny(vocab_size=128)
    params = decoder_params_from_hf(model.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(31)
    B, P = 2, 6
    ids = rng.integers(0, 128, (B, P))
    mask = np.ones((B, P), dtype=np.int64)
    mask[1, :2] = 0
    max_new = 8
    pad = 127

    with torch.no_grad():
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        ref = model.generate(
            inputs_embeds=embeds, attention_mask=torch.tensor(mask),
            max_new_tokens=max_new, num_beams=num_beams, do_sample=False,
            eos_token_id=eos, pad_token_id=pad,
            length_penalty=1.0, early_stopping=False).numpy()

    out = np.asarray(beam_search(
        cfg.core(), params,
        inputs_embeds=jnp.asarray(embeds.numpy()),
        attention_mask=jnp.asarray(mask),
        gen_cfg=GenerationConfig(max_new_tokens=max_new, eos_token_id=eos,
                                 pad_token_id=pad),
        num_beams=num_beams))

    L = ref.shape[1]
    np.testing.assert_array_equal(out[:, :L], ref)
    if L < max_new:
        assert (out[:, L:] == pad).all()


@pytest.mark.parametrize("length_penalty", [0.5, 2.0, -0.5])
def test_beam_search_length_penalty_matches_hf(hf_llama, length_penalty):
    """length_penalty != 1.0 changes which finished hypothesis wins; must
    track HF BeamHypotheses scoring exactly (VERDICT round-1 item #8)."""
    import torch

    model = hf_llama
    cfg = LlamaConfig.tiny(vocab_size=128)
    params = decoder_params_from_hf(model.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(77)
    B, P, K, max_new, eos, pad = 2, 5, 3, 10, 64, 127
    ids = rng.integers(0, 128, (B, P))
    mask = np.ones((B, P), dtype=np.int64)

    with torch.no_grad():
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        ref = model.generate(
            inputs_embeds=embeds, attention_mask=torch.tensor(mask),
            max_new_tokens=max_new, num_beams=K, do_sample=False,
            eos_token_id=eos, pad_token_id=pad,
            length_penalty=length_penalty, early_stopping=False).numpy()

    out = np.asarray(beam_search(
        cfg.core(), params,
        inputs_embeds=jnp.asarray(embeds.numpy()),
        attention_mask=jnp.asarray(mask),
        gen_cfg=GenerationConfig(max_new_tokens=max_new, eos_token_id=eos,
                                 pad_token_id=pad),
        num_beams=K, length_penalty=length_penalty))

    L = ref.shape[1]
    np.testing.assert_array_equal(out[:, :L], ref)
    if L < max_new:
        assert (out[:, L:] == pad).all()


def test_beam_search_early_stopping_matches_hf(hf_llama):
    import torch

    model = hf_llama
    cfg = LlamaConfig.tiny(vocab_size=128)
    params = decoder_params_from_hf(model.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(99)
    B, P, K, max_new, eos, pad = 2, 5, 3, 12, 64, 127
    ids = rng.integers(0, 128, (B, P))
    mask = np.ones((B, P), dtype=np.int64)

    with torch.no_grad():
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        ref = model.generate(
            inputs_embeds=embeds, attention_mask=torch.tensor(mask),
            max_new_tokens=max_new, num_beams=K, do_sample=False,
            eos_token_id=eos, pad_token_id=pad,
            length_penalty=1.0, early_stopping=True).numpy()

    out = np.asarray(beam_search(
        cfg.core(), params,
        inputs_embeds=jnp.asarray(embeds.numpy()),
        attention_mask=jnp.asarray(mask),
        gen_cfg=GenerationConfig(max_new_tokens=max_new, eos_token_id=eos,
                                 pad_token_id=pad),
        num_beams=K, early_stopping=True))

    L = ref.shape[1]
    np.testing.assert_array_equal(out[:, :L], ref)
    if L < max_new:
        assert (out[:, L:] == pad).all()


def test_generation_config_kwarg_accepted(hf_llama):
    """HF-parity surface: model.generate(..., generation_config=cfg) works
    and flat kwargs override its fields."""
    from prot2text_tpu.infer.generate import resolve_generation_config

    base = GenerationConfig(max_new_tokens=7, eos_token_id=5, num_beams=2)
    got = resolve_generation_config(1, 2, {"generation_config": base})
    assert got == base
    got2 = resolve_generation_config(
        1, 2, {"generation_config": base, "max_new_tokens": 3})
    assert got2.max_new_tokens == 3 and got2.num_beams == 2
    flat = resolve_generation_config(11, 22, {"max_new_tokens": 4})
    assert flat.eos_token_id == 11 and flat.pad_token_id == 22


@pytest.mark.slow
def test_beam_sample_mechanics():
    """Beam-SAMPLE (transformers >=4.45 unified _beam_search semantics:
    warpers per beam row BEFORE the beam scores are added, 2K drawn
    without replacement from the flat accumulated scores, accumulated
    score bookkeeping).  Stochastic path — pinned mechanically:
    deterministic per key, differs across keys, and the temperature→0
    limit recovers greedy beam search."""
    import jax

    from prot2text_tpu.infer.generate import GenerationConfig
    from prot2text_tpu.infer.beam_search import beam_search

    from prot2text_tpu.models.decoder import (
        DecoderConfig, init_decoder_params)

    cfg = DecoderConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, head_dim=16,
        rope_theta=10000.0)
    params = init_decoder_params(cfg, jax.random.PRNGKey(5))
    nprng = np.random.default_rng(8)
    emb = jnp.asarray(nprng.standard_normal((2, 5, 64)), jnp.float32)
    mask = jnp.ones((2, 5), jnp.int32)
    kw = dict(inputs_embeds=emb, attention_mask=mask, num_beams=3,
              attn_impl="xla", cache_dtype=jnp.float32)
    greedy_cfg = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                                  pad_token_id=0)
    greedy = np.asarray(beam_search(cfg, params, gen_cfg=greedy_cfg, **kw))

    warm = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                            pad_token_id=0, do_sample=True, temperature=5.0)
    s1 = np.asarray(beam_search(cfg, params, gen_cfg=warm,
                                rng=jax.random.PRNGKey(1), **kw))
    s1b = np.asarray(beam_search(cfg, params, gen_cfg=warm,
                                 rng=jax.random.PRNGKey(1), **kw))
    s2 = np.asarray(beam_search(cfg, params, gen_cfg=warm,
                                rng=jax.random.PRNGKey(2), **kw))
    np.testing.assert_array_equal(s1, s1b)       # deterministic per key
    assert not np.array_equal(s1, s2)            # keys matter at T=5

    cold = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                            pad_token_id=0, do_sample=True,
                            temperature=1e-4)
    c = np.asarray(beam_search(cfg, params, gen_cfg=cold,
                               rng=jax.random.PRNGKey(3), **kw))
    np.testing.assert_array_equal(c, greedy)     # T→0 limit = greedy beams
