"""Greedy KV-cached generation vs HF `generate(inputs_embeds=...)`.

The reference decodes via HF GenerationMixin from prompt embeddings
(modeling_esm2llama_instruct.py:247-251) — outputs contain only new tokens.
BASELINE.md requires bit-equivalent greedy generations; this is the tiny-scale
anchor for that.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prot2text_tpu.infer.generate import GenerationConfig, generate
from prot2text_tpu.models.hf_import import decoder_params_from_hf
from prot2text_tpu.models.llama import LlamaConfig


@pytest.fixture(scope="module")
def hf_llama():
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    torch.manual_seed(7)
    cfg = HFLlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_dropout=0.0, rms_norm_eps=1e-5,
    )
    return LlamaForCausalLM(cfg).eval()


def test_greedy_generation_matches_hf(hf_llama):
    import torch

    model = hf_llama
    cfg = LlamaConfig.tiny()
    params = decoder_params_from_hf(model.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(11)
    B, P = 2, 10
    ids = rng.integers(0, 256, (B, P))
    mask = np.ones((B, P), dtype=np.int64)
    mask[1, :3] = 0  # left padding
    ids[1, :3] = 0

    max_new = 12
    eos = 255
    pad = 254

    with torch.no_grad():
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        ref = model.generate(
            inputs_embeds=embeds,
            attention_mask=torch.tensor(mask),
            max_new_tokens=max_new,
            do_sample=False,
            eos_token_id=eos,
            pad_token_id=pad,
        ).numpy()

    jemb = jnp.asarray(embeds.numpy())
    out = generate(
        cfg.core(), params,
        inputs_embeds=jemb,
        attention_mask=jnp.asarray(mask),
        gen_cfg=GenerationConfig(
            max_new_tokens=max_new, eos_token_id=eos, pad_token_id=pad),
    )
    out = np.asarray(out)

    # HF may stop early once every row emits EOS; compare the emitted prefix
    L = ref.shape[1]
    np.testing.assert_array_equal(out[:, :L], ref)
    if L < max_new:
        assert (out[:, L:] == pad).all()


def test_kv_cache_decode_matches_full_forward():
    """Step-by-step cached decode reproduces full-sequence logits."""
    from prot2text_tpu.models.decoder import (
        causal_bias_from_mask, decoder_forward, decoder_logits, embed_tokens,
    )
    from prot2text_tpu.infer.kvcache import init_kv_cache
    from prot2text_tpu.infer.generate import _prefill_bias, _bias_from_kv_mask

    cfg = LlamaConfig.tiny().core()
    from prot2text_tpu.models.decoder import init_decoder_params

    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B, S = 2, 8
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    mask = np.ones((B, S), dtype=np.int64)

    emb = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.asarray(mask))
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    h_full, _ = decoder_forward(cfg, params, inputs_embeds=emb, bias=bias,
                                positions=pos)
    logits_full = decoder_logits(cfg, params, h_full)

    # prefill first 4, then decode 4 steps
    P = 4
    T = S
    cache = init_kv_cache(cfg, B, T, jnp.float32)
    pre_bias = _prefill_bias(jnp.asarray(mask[:, :P]), T)
    h, cache = decoder_forward(
        cfg, params, inputs_embeds=emb[:, :P], bias=pre_bias,
        positions=pos[:, :P], kv_cache=cache, cache_index=0)
    logits_steps = [decoder_logits(cfg, params, h)]

    kv_mask = np.zeros((B, T), np.int32)
    kv_mask[:, :P] = 1
    for t in range(P, S):
        kv_mask[:, t] = 1
        bias_t = _bias_from_kv_mask(jnp.asarray(kv_mask), 1)
        h, cache = decoder_forward(
            cfg, params, inputs_embeds=emb[:, t:t + 1], bias=bias_t,
            positions=pos[:, t:t + 1], kv_cache=cache, cache_index=t)
        logits_steps.append(decoder_logits(cfg, params, h))

    logits_cat = jnp.concatenate(logits_steps, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_cat), np.asarray(logits_full), atol=2e-5, rtol=2e-5)


def test_kv_cache_decode_matches_full_forward_bktd_layout():
    """Same cached-vs-full check for the batch-leading (D=128) cache layout
    used by the D=128 flagships (models/decoder.kv_cache_layout)."""
    from prot2text_tpu.models.decoder import (
        DecoderConfig, causal_bias_from_mask, decoder_forward, decoder_logits,
        init_decoder_params, kv_cache_layout,
    )
    from prot2text_tpu.infer.kvcache import init_kv_cache
    from prot2text_tpu.infer.generate import _prefill_bias, _bias_from_kv_mask

    cfg = DecoderConfig(vocab_size=64, hidden_size=256, num_layers=2,
                        num_heads=2, num_kv_heads=2, intermediate_size=128,
                        head_dim=128, rope_theta=1e4)
    assert kv_cache_layout(cfg) == "bktd"
    params = init_decoder_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    B, S = 2, 8
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    mask = np.ones((B, S), dtype=np.int64)

    emb = params["embed_tokens"][jnp.asarray(ids)]
    bias = causal_bias_from_mask(jnp.asarray(mask))
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    h_full, _ = decoder_forward(cfg, params, inputs_embeds=emb, bias=bias,
                                positions=pos)
    logits_full = decoder_logits(cfg, params, h_full)

    P = 4
    cache = init_kv_cache(cfg, B, S, jnp.float32)
    assert cache["k"].shape == (2, B, 2, S, 128)
    pre_bias = _prefill_bias(jnp.asarray(mask[:, :P]), S)
    h, cache = decoder_forward(
        cfg, params, inputs_embeds=emb[:, :P], bias=pre_bias,
        positions=pos[:, :P], kv_cache=cache, cache_index=0)
    logits_steps = [decoder_logits(cfg, params, h)]
    kv_mask = np.zeros((B, S), np.int32)
    kv_mask[:, :P] = 1
    from prot2text_tpu.models.decoder import decoder_decode_step

    for t in range(P, S):
        bias_t = _bias_from_kv_mask(jnp.asarray(kv_mask), 1)
        h, cache = decoder_decode_step(
            cfg, params, token_embeds=emb[:, t:t + 1], bias_old=bias_t,
            positions=pos[:, t:t + 1], kv_cache=cache, cache_index=t)
        kv_mask[:, t] = 1
        logits_steps.append(decoder_logits(cfg, params, h))

    logits_cat = jnp.concatenate(logits_steps, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_cat), np.asarray(logits_full), atol=2e-5, rtol=2e-5)
