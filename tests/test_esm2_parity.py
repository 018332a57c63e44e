"""Golden parity: our ESM2 encoder vs HF `EsmModel` (random tiny weights).

The reference's encoder is HF EsmModel with add_pooling_layer=False
(modeling_esm2llama_instruct.py:90-93); our JAX stack must reproduce its
hidden states to fp32 tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from prot2text_tpu.models.esm2 import ESM2Config, esm2_encode
from prot2text_tpu.models.hf_import import esm2_params_from_hf


@pytest.fixture(scope="module")
def hf_esm():
    import torch
    from transformers import EsmConfig, EsmModel

    torch.manual_seed(0)
    cfg = EsmConfig(
        vocab_size=33,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=512,
        position_embedding_type="rotary",
        pad_token_id=1,
        mask_token_id=32,
        token_dropout=True,
        layer_norm_eps=1e-5,
        emb_layer_norm_before=False,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = EsmModel(cfg, add_pooling_layer=False).eval()
    return cfg, model


def test_esm2_hidden_states_match_hf(hf_esm):
    import torch

    hf_cfg, model = hf_esm
    cfg = ESM2Config(
        vocab_size=33, hidden_size=64, num_layers=3, num_heads=4,
        intermediate_size=128,
    )
    params = esm2_params_from_hf(model.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(0)
    B, S = 3, 17
    lengths = [17, 11, 5]
    ids = np.full((B, S), 1, dtype=np.int64)  # pad
    mask = np.zeros((B, S), dtype=np.int64)
    for b, L in enumerate(lengths):
        ids[b, 0] = 0  # cls
        ids[b, 1:L - 1] = rng.integers(4, 24, L - 2)
        ids[b, L - 1] = 2  # eos
        mask[b, :L] = 1
    # include a mask token to exercise token-dropout scaling
    ids[0, 3] = 32

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    out = esm2_encode(cfg, params, jnp.asarray(ids), jnp.asarray(mask))
    out = np.asarray(out)

    # padded positions are garbage in both; compare valid positions only
    m = mask.astype(bool)
    np.testing.assert_allclose(out[m], ref[m], atol=2e-5, rtol=2e-5)


def test_esm2_inputs_embeds_path(hf_esm):
    """protein_inputs_embeds bypass (reference forward arg) matches HF."""
    import torch

    hf_cfg, model = hf_esm
    cfg = ESM2Config(vocab_size=33, hidden_size=64, num_layers=3, num_heads=4,
                     intermediate_size=128)
    params = esm2_params_from_hf(model.state_dict(), cfg.num_layers)
    rng = np.random.default_rng(4)
    B, S = 2, 9
    embeds = rng.standard_normal((B, S, 64)).astype(np.float32)
    mask = np.ones((B, S), np.int64)
    with torch.no_grad():
        ref = model(inputs_embeds=torch.tensor(embeds),
                    attention_mask=torch.tensor(mask)).last_hidden_state
    out = esm2_encode(cfg, params, attention_mask=jnp.asarray(mask),
                      inputs_embeds=jnp.asarray(embeds))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=3e-5, rtol=3e-5)
