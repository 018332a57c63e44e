"""PEFT adapter-dir round trip against the real peft library."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def peft_setup(tmp_path_factory):
    import torch
    from peft import LoraConfig as PeftLoraConfig, get_peft_model
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    torch.manual_seed(5)
    base = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_dropout=0.0))
    pm = get_peft_model(base, PeftLoraConfig(
        r=4, lora_alpha=8, lora_dropout=0.0,
        target_modules=["q_proj", "k_proj", "v_proj", "o_proj",
                        "gate_proj", "up_proj", "down_proj"]))
    # make the adapter non-trivial (B is zero-init)
    with torch.no_grad():
        for n, p in pm.named_parameters():
            if "lora_B" in n:
                p.add_(torch.randn_like(p) * 0.05)
    d = str(tmp_path_factory.mktemp("peft"))
    pm.save_pretrained(d)
    return pm, d


def test_peft_dir_matches_merged_model(peft_setup):
    import torch

    pm, d = peft_setup
    merged = pm.merge_and_unload()

    del merged  # strategy: apply the saved adapter dir to a FRESH base with
    # both frameworks and compare the merged weights

    from prot2text_tpu.models.hf_import import decoder_params_from_hf
    from prot2text_tpu.models.lora import merge_lora
    from prot2text_tpu.models.peft_interop import lora_params_from_peft_dir

    import torch as _t
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    _t.manual_seed(11)
    fresh = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_dropout=0.0))
    # snapshot BEFORE peft wraps/merges in place
    base_params = decoder_params_from_hf(
        {k: v.clone() for k, v in fresh.state_dict().items()}, 2)

    from peft import PeftModel

    pfresh = PeftModel.from_pretrained(fresh, d)
    pmerged = pfresh.merge_and_unload()
    lora_tree, lcfg = lora_params_from_peft_dir(d, base_params)
    assert lcfg.r == 4 and lcfg.alpha == 8
    ours_merged = merge_lora(lcfg, base_params, lora_tree)
    ref_params = decoder_params_from_hf(pmerged.state_dict(), 2)

    for a, b in zip(jax.tree_util.tree_leaves(ours_merged),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=2e-6)


def test_save_peft_dir_roundtrip(tmp_path):
    from prot2text_tpu.models.decoder import DecoderConfig, init_decoder_params
    from prot2text_tpu.models.lora import LoraConfig, init_lora_params
    from prot2text_tpu.models.peft_interop import (
        lora_params_from_peft_dir, save_peft_dir,
    )

    cfg = DecoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, num_kv_heads=2, intermediate_size=64,
                        head_dim=8)
    base = init_decoder_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=3, alpha=6)
    lora = init_lora_params(lcfg, base, jax.random.PRNGKey(1))
    lora = jax.tree_util.tree_map(lambda x: x + 0.03, lora)

    d = str(tmp_path / "peft_out")
    save_peft_dir(d, lora, lcfg)
    lora2, lcfg2 = lora_params_from_peft_dir(d, base)
    assert lcfg2.r == 3 and lcfg2.alpha == 6
    a1 = lora["layers"]["q_proj"]["kernel"]["A"]
    a2 = lora2["layers"]["q_proj"]["kernel"]["A"]
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)
    b1 = lora["layers"]["down_proj"]["kernel"]["B"]
    b2 = lora2["layers"]["down_proj"]["kernel"]["B"]
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)
