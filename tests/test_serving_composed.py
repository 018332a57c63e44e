"""Continuous batching over the COMPOSED instruct model family.

A reference user serves Esm2LlamaInstructForCausalLM by computing fused
decoder inputs once (`return_decoder_inputs=True` — encoder + adapter +
placeholder merge) and feeding each request's valid embedding run into the
slot pool; tokens must equal the model's own batch generate().
"""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from prot2text_tpu.infer.serving import ContinuousBatcher
from prot2text_tpu.models import (
    ESM2Config, Esm2LlamaInstructConfig, Esm2LlamaInstructForCausalLM,
    LlamaConfig, ModalityAdapterConfig,
)

PH = 99


def _model():
    cfg = Esm2LlamaInstructConfig(
        esm_config=ESM2Config(hidden_size=32, num_layers=2, num_heads=4,
                              intermediate_size=64),
        adapter_config=ModalityAdapterConfig(32, 48, 64),
        llama_config=LlamaConfig.tiny(vocab_size=128),
        placeholder_id=PH,
    )
    return Esm2LlamaInstructForCausalLM(cfg)


def _batch(lengths=(8, 5, 7), S=14, P=8):
    B = len(lengths)
    pids = np.full((B, P), 1)
    pmask = np.zeros((B, P), np.int32)
    ids = np.full((B, S), 7)
    mask = np.ones((B, S), np.int32)
    for b, L in enumerate(lengths):
        pids[b, 0] = 0
        pids[b, 1:L - 1] = 5
        pids[b, L - 1] = 2
        pmask[b, :L] = 1
        pad = S - (L + 4)
        ids[b, :pad] = 0
        mask[b, :pad] = 0
        ids[b, pad:pad + 2] = [1, 2]
        ids[b, pad + 2:pad + 2 + L] = PH
        ids[b, pad + 2 + L:] = 3
    return (jnp.asarray(pids), jnp.asarray(pmask), jnp.asarray(ids),
            jnp.asarray(mask))


@pytest.mark.slow
def test_composed_model_serves_continuously():
    model = _model()
    pids, pmask, ids, mask = _batch()
    NEW = 5

    ref = np.asarray(model.generate(
        ids, attention_mask=mask, protein_input_ids=pids,
        protein_attention_mask=pmask, max_new_tokens=NEW,
        eos_token_id=-1, pad_token_id=-7))

    # fused decoder inputs, once per batch (encoder + adapter + merge)
    emb, amask = model.apply(
        model.config, model.params, input_ids=ids, attention_mask=mask,
        protein_input_ids=pids, protein_attention_mask=pmask,
        return_decoder_inputs=True)
    emb, amask = np.asarray(emb), np.asarray(amask)

    core = model.config.llama_config.core()
    eng = ContinuousBatcher(core, model.params["llama_decoder"],
                            max_slots=2, max_len=14 + NEW, prompt_pad=14,
                            eos_token_id=-1, cache_dtype=jnp.float32,
                            sync_every=2)
    for b in range(emb.shape[0]):
        eng.submit(b, emb[b][amask[b] == 1], max_new_tokens=NEW)
    out = dict(eng.run())
    for b in range(emb.shape[0]):
        assert out[b] == ref[b].tolist(), (b, out[b], ref[b])
