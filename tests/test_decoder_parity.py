"""Golden parity: shared decoder core vs HF LlamaForCausalLM / Qwen3ForCausalLM.

The reference decodes through these HF classes
(modeling_esm2llama_instruct.py:204-215, esmc_qwen_arc.py:208); our jitted
JAX stack must match their logits for teacher-forcing batches (fp32).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from prot2text_tpu.models.decoder import causal_bias_from_mask, cross_entropy_loss
from prot2text_tpu.models.hf_import import decoder_params_from_hf
from prot2text_tpu.models.llama import LlamaConfig, llama_forward, llama_logits
from prot2text_tpu.models.qwen3 import Qwen3Config, qwen3_forward, qwen3_logits


def _batch(vocab, B=2, S=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, (B, S))
    mask = np.ones((B, S), dtype=np.int64)
    mask[1, :4] = 0  # left padding on row 1
    return ids, mask


@pytest.fixture(scope="module")
def hf_llama():
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    cfg = HFLlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_dropout=0.0, rms_norm_eps=1e-5,
    )
    return LlamaForCausalLM(cfg).eval()


def test_llama_logits_match_hf(hf_llama):
    import torch

    model = hf_llama
    cfg = LlamaConfig.tiny()
    params = decoder_params_from_hf(model.state_dict(), cfg.num_layers)

    ids, mask = _batch(cfg.vocab_size)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).logits.numpy()

    B, S = ids.shape
    from prot2text_tpu.models.decoder import embed_tokens

    embeds = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.asarray(mask))
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    h, _ = llama_forward(cfg, params, inputs_embeds=embeds, bias=bias,
                         positions=positions)
    logits = np.asarray(llama_logits(cfg, params, h))

    m = mask.astype(bool)
    np.testing.assert_allclose(logits[m], ref[m], atol=3e-5, rtol=3e-5)


def test_llama_loss_matches_hf(hf_llama):
    import torch

    model = hf_llama
    cfg = LlamaConfig.tiny()
    params = decoder_params_from_hf(model.state_dict(), cfg.num_layers)

    ids, mask = _batch(cfg.vocab_size, seed=3)
    labels = np.where(mask.astype(bool), ids, -100)
    labels[:, :6] = -100  # prompt region masked like the collators do

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            labels=torch.tensor(labels),
        ).loss.item()

    from prot2text_tpu.models.decoder import embed_tokens

    B, S = ids.shape
    embeds = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.asarray(mask))
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    h, _ = llama_forward(cfg, params, inputs_embeds=embeds, bias=bias,
                         positions=positions)
    logits = llama_logits(cfg, params, h)
    loss = float(cross_entropy_loss(logits, jnp.asarray(labels)))
    assert abs(loss - ref) < 1e-4


@pytest.fixture(scope="module")
def hf_qwen3():
    import torch
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM

    torch.manual_seed(2)
    cfg = HFQwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=1000000.0, tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    return Qwen3ForCausalLM(cfg).eval()


def test_qwen3_logits_match_hf(hf_qwen3):
    import torch

    model = hf_qwen3
    cfg = Qwen3Config.tiny()
    params = decoder_params_from_hf(model.state_dict(), cfg.num_layers,
                                    qk_norm=True)

    ids, mask = _batch(cfg.vocab_size, seed=5)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).logits.numpy()

    from prot2text_tpu.models.decoder import embed_tokens

    B, S = ids.shape
    embeds = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.asarray(mask))
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    h, _ = qwen3_forward(cfg, params, inputs_embeds=embeds, bias=bias,
                         positions=positions)
    logits = np.asarray(qwen3_logits(cfg, params, h))

    m = mask.astype(bool)
    np.testing.assert_allclose(logits[m], ref[m], atol=3e-5, rtol=3e-5)
