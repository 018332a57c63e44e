"""End-to-end smoke + semantics tests for the composed models (tiny configs).

Covers the four reference model families (SURVEY.md §2.1) and the fusion
semantics: placeholder merge (instruct/ESMCQwen), concat (legacy), RGCN graph
variant, ESMCQwen raw-string path with the count ValueError
(esmc_qwen_arc.py:137-141).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prot2text_tpu.models import (
    ESM2Config, ESMCQwen, ESMCQwenConfig, Esm2LlamaConfig,
    Esm2LlamaForCausalLM, Esm2LlamaInstructConfig,
    Esm2LlamaInstructForCausalLM, Esm2Rgcn2LlamaInstructConfig,
    Esm2Rgcn2LlamaInstructForCausalLM, LlamaConfig, ModalityAdapterConfig,
    Qwen3Config, RgcnAdapterConfig,
)
from prot2text_tpu.models.esmc import ESMCConfig
from prot2text_tpu.models.fusion import placeholder_merge

PH = 99


def _tiny_esm():
    return ESM2Config(hidden_size=32, num_layers=2, num_heads=4,
                      intermediate_size=64)


def _tiny_llama():
    return LlamaConfig.tiny(vocab_size=128)


def _protein_batch(B=2, P=8, lengths=(8, 5)):
    ids = np.full((B, P), 1)
    mask = np.zeros((B, P), np.int32)
    for b, L in enumerate(lengths):
        ids[b, 0] = 0
        ids[b, 1:L - 1] = 5
        ids[b, L - 1] = 2
        mask[b, :L] = 1
    return jnp.asarray(ids), jnp.asarray(mask)


def _chat_batch(lengths=(8, 5), S=14, vocab=128):
    B = len(lengths)
    ids = np.full((B, S), 7)
    mask = np.ones((B, S), np.int32)
    labels = np.full((B, S), -100)
    for b, L in enumerate(lengths):
        pad = S - (L + 4)
        ids[b, :pad] = 0
        mask[b, :pad] = 0
        ids[b, pad:pad + 2] = [1, 2]
        ids[b, pad + 2:pad + 2 + L] = PH
        ids[b, pad + 2 + L:] = 3
        labels[b, pad + 2 + L:] = 3
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels)


@pytest.mark.slow
def test_instruct_forward_and_generate():
    cfg = Esm2LlamaInstructConfig(
        esm_config=_tiny_esm(),
        adapter_config=ModalityAdapterConfig(32, 48, 64),
        llama_config=_tiny_llama(),
        placeholder_id=PH,
    )
    model = Esm2LlamaInstructForCausalLM(cfg)
    pids, pmask = _protein_batch()
    ids, mask, labels = _chat_batch()

    out = model.forward(input_ids=ids, attention_mask=mask, labels=labels,
                        protein_input_ids=pids,
                        protein_attention_mask=pmask)
    assert np.isfinite(float(out.loss))
    assert out.logits.shape == (2, 14, 128)

    # early-exit flags
    enc = model.forward(protein_input_ids=pids, protein_attention_mask=pmask,
                        return_encoder_outputs=True)
    assert enc.shape == (2, 8, 32)
    ad, am = model.forward(protein_input_ids=pids,
                           protein_attention_mask=pmask,
                           return_adapter_outputs=True)
    assert ad.shape == (2, 8, 64)

    toks = model.generate(ids, attention_mask=mask, protein_input_ids=pids,
                          protein_attention_mask=pmask, max_new_tokens=4)
    assert toks.shape == (2, 4)


def test_legacy_forward_and_generate_includes_prompt():
    cfg = Esm2LlamaConfig(
        esm_config=_tiny_esm(), llama_config=_tiny_llama(),
        decoder_hidden_size=64, eos_token_id=127)
    model = Esm2LlamaForCausalLM(cfg)
    pids, pmask = _protein_batch()

    B, S = 2, 6
    ids = jnp.asarray(np.full((B, S), 9))
    mask = jnp.ones((B, S), jnp.int32)
    labels = jnp.asarray(np.full((B, S), 9))
    out = model.forward(input_ids=ids, attention_mask=mask, labels=labels,
                        protein_input_ids=pids,
                        protein_attention_mask=pmask)
    assert np.isfinite(float(out.loss))
    # logits cover [protein ‖ text]
    assert out.logits.shape == (2, 8 + S, 128)

    gen = model.generate(protein_input_ids=pids,
                         protein_attention_mask=pmask, max_new_tokens=3)
    # default prompt bos + new tokens
    assert gen.shape == (2, 1 + 3)
    assert int(gen[0, 0]) == cfg.bos_token_id


def test_rgcn_instruct_forward():
    cfg = Esm2Rgcn2LlamaInstructConfig(
        esm_config=_tiny_esm(),
        adapter_config=RgcnAdapterConfig(32, 48, 64, n_relations=3,
                                         n_layers=2),
        llama_config=_tiny_llama(),
        placeholder_id=PH,
    )
    model = Esm2Rgcn2LlamaInstructForCausalLM(cfg)
    pids, pmask = _protein_batch()
    ids, mask, labels = _chat_batch()
    # flat-node-space edges (B=2, P=8): row0 nodes 1..6, row1 nodes 9..11
    ei = jnp.asarray(np.array([[1, 2, 9], [2, 3, 10]]))
    et = jnp.asarray(np.array([0, 1, 2]))
    em = jnp.asarray(np.ones(3, np.int32))

    out = model.forward(input_ids=ids, attention_mask=mask, labels=labels,
                        protein_input_ids=pids,
                        protein_attention_mask=pmask,
                        graph_edge_index=ei, graph_edge_type=et,
                        graph_edge_mask=em)
    assert np.isfinite(float(out.loss))
    toks = model.generate(ids, attention_mask=mask, protein_input_ids=pids,
                          protein_attention_mask=pmask, graph_edge_index=ei,
                          graph_edge_type=et, graph_edge_mask=em,
                          max_new_tokens=3)
    assert toks.shape == (2, 3)


def test_esmcqwen_raw_strings_and_count_check():
    cfg = ESMCQwenConfig(
        esm_config=ESMCConfig.tiny(),
        adapter_config=ModalityAdapterConfig(64, 48, 64),
        llm_config=Qwen3Config.tiny(vocab_size=128),
        placeholder_id=PH,
    )
    model = ESMCQwen(cfg)
    seqs = ["MKTAYI", "MKT"]  # tokenized to 8 and 5 tokens (cls/eos)
    ids, mask, labels = _chat_batch(lengths=(8, 5))

    out = model.forward(protein_sequences=seqs, input_ids=ids,
                        attention_mask=mask, labels=labels)
    assert np.isfinite(float(out.loss))

    enc = model.forward(protein_sequences=seqs, return_encoder_outputs=True)
    assert enc[0].shape == (2, 8, 64)

    toks = model.generate(input_ids=ids, attention_mask=mask,
                          protein_sequences=seqs, max_new_tokens=3)
    assert toks.shape == (2, 3)

    with pytest.raises(ValueError, match="placeholder"):
        model.forward(protein_sequences=["MKTAYIQQ", "MKT"],  # wrong lengths
                      input_ids=ids, attention_mask=mask, labels=labels)


def test_placeholder_merge_oracle():
    rng = np.random.default_rng(0)
    B, S, P, H = 3, 12, 8, 5
    ids = rng.integers(0, 50, (B, S))
    enc = rng.standard_normal((B, P, H)).astype(np.float32)
    emask = np.zeros((B, P), np.int64)
    for b, L in enumerate([8, 5, 3]):
        emask[b, :L] = 1
        pos = np.sort(rng.choice(S, L, replace=False))
        ids[b, pos] = PH
    emb = rng.standard_normal((B, S, H)).astype(np.float32)
    out = np.asarray(placeholder_merge(
        jnp.asarray(emb), jnp.asarray(ids), jnp.asarray(enc),
        jnp.asarray(emask), PH))
    oracle = emb.copy()
    oracle[ids == PH] = enc[emask.astype(bool)]
    np.testing.assert_allclose(out, oracle)
