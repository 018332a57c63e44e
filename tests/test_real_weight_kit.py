"""Real-weight readiness kit (VERDICT r2 #4).

The zero-egress image has no pretrained checkpoints, so real-weight
validation must be ONE command away for any weights-bearing environment.
These tests prove the whole on-disk path works end-to-end by fabricating
HF-SHAPED checkpoint directories — config.json + SHARDED safetensors +
model.safetensors.index.json, exactly what `huggingface_hub.snapshot_download`
produces for esm2_t33 / Llama-3.x / Qwen3 — running `cli/convert_checkpoint`
on them, restoring the orbax artifacts, and re-running greedy/hidden-state
parity against the same torch modules.

With real checkpoints the identical commands are (README "Real-weight
validation"):

    python -m prot2text_tpu.cli.convert_checkpoint \
        --output_dir ckpt --esm2_dir <esm2_t33_dir> \
        --decoder_dir <llama_dir> --dtype fp32
    python -m prot2text_tpu.cli.convert_checkpoint \
        --output_dir ckpt_q --decoder_dir <qwen3_dir> --qwen3 true
    python -m prot2text_tpu.cli.convert_checkpoint \
        --output_dir ckpt_e --esmc_path <esmc_600m .pt> --esmc_num_layers 36

Reference loading surfaces being covered: the 4-way
Esm2LlamaConfig.from_pretrained (modeling_esm2llama_legacy.py:173-292) and
ESMC.from_pretrained (esmc_qwen_arc.py:40-47).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from prot2text_tpu.cli.convert_checkpoint import main as convert_main
from prot2text_tpu.core.checkpoint import restore_checkpoint


def _assert_sharded(hf_dir):
    """The fixture must actually exercise the sharded-safetensors layout."""
    import os

    names = os.listdir(hf_dir)
    shards = [n for n in names if n.endswith(".safetensors")]
    assert len(shards) >= 2, f"expected sharded save, got {names}"
    assert "model.safetensors.index.json" in names
    assert "config.json" in names


@pytest.mark.slow
def test_sharded_llama_dir_convert_and_greedy_parity(tmp_path):
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.llama import LlamaConfig

    torch.manual_seed(7)
    model = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_dropout=0.0, rms_norm_eps=1e-5)).eval()
    hf_dir = str(tmp_path / "llama")
    model.save_pretrained(hf_dir, safe_serialization=True,
                          max_shard_size="150KB")
    _assert_sharded(hf_dir)

    out = str(tmp_path / "ckpt")
    convert_main(["--output_dir", out, "--decoder_dir", hf_dir,
                  "--dtype", "fp32"])
    params = restore_checkpoint(out, step=0)["llm_decoder"]

    cfg = LlamaConfig.tiny()
    rng = np.random.default_rng(11)
    B, P, max_new, eos, pad = 2, 10, 12, 255, 254
    ids = rng.integers(0, 256, (B, P))
    mask = np.ones((B, P), dtype=np.int64)
    mask[1, :3] = 0
    ids[1, :3] = 0
    with torch.no_grad():
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        ref = model.generate(
            inputs_embeds=embeds, attention_mask=torch.tensor(mask),
            max_new_tokens=max_new, do_sample=False,
            eos_token_id=eos, pad_token_id=pad).numpy()
    got = np.asarray(generate(
        cfg.core(), params, inputs_embeds=jnp.asarray(embeds.numpy()),
        attention_mask=jnp.asarray(mask),
        gen_cfg=GenerationConfig(max_new_tokens=max_new, eos_token_id=eos,
                                 pad_token_id=pad)))
    L = ref.shape[1]
    np.testing.assert_array_equal(got[:, :L], ref)


def test_sharded_qwen3_dir_convert_and_greedy_parity(tmp_path):
    import torch
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM

    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.qwen3 import Qwen3Config

    torch.manual_seed(2)
    model = Qwen3ForCausalLM(HFQwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=1000000.0, tie_word_embeddings=False,
        attention_dropout=0.0)).eval()
    hf_dir = str(tmp_path / "qwen3")
    model.save_pretrained(hf_dir, safe_serialization=True,
                          max_shard_size="150KB")
    _assert_sharded(hf_dir)

    out = str(tmp_path / "ckpt")
    convert_main(["--output_dir", out, "--decoder_dir", hf_dir,
                  "--qwen3", "true", "--dtype", "fp32"])
    params = restore_checkpoint(out, step=0)["llm_decoder"]

    cfg = Qwen3Config.tiny()
    rng = np.random.default_rng(13)
    B, P, max_new, eos, pad = 2, 8, 10, 255, 254
    ids = rng.integers(0, 256, (B, P))
    mask = np.ones((B, P), dtype=np.int64)
    with torch.no_grad():
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        ref = model.generate(
            inputs_embeds=embeds, attention_mask=torch.tensor(mask),
            max_new_tokens=max_new, do_sample=False,
            eos_token_id=eos, pad_token_id=pad).numpy()
    got = np.asarray(generate(
        cfg.core(), params, inputs_embeds=jnp.asarray(embeds.numpy()),
        attention_mask=jnp.asarray(mask),
        gen_cfg=GenerationConfig(max_new_tokens=max_new, eos_token_id=eos,
                                 pad_token_id=pad)))
    L = ref.shape[1]
    np.testing.assert_array_equal(got[:, :L], ref)


def test_sharded_esm2_dir_convert_and_hidden_parity(tmp_path):
    import torch
    from transformers import EsmConfig, EsmModel

    from prot2text_tpu.models.esm2 import ESM2Config, esm2_encode

    torch.manual_seed(0)
    model = EsmModel(EsmConfig(
        vocab_size=33, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=512, position_embedding_type="rotary",
        pad_token_id=1, mask_token_id=32, token_dropout=True,
        layer_norm_eps=1e-5, emb_layer_norm_before=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0),
        add_pooling_layer=False).eval()
    hf_dir = str(tmp_path / "esm2")
    model.save_pretrained(hf_dir, safe_serialization=True,
                          max_shard_size="100KB")
    _assert_sharded(hf_dir)

    out = str(tmp_path / "ckpt")
    convert_main(["--output_dir", out, "--esm2_dir", hf_dir,
                  "--dtype", "fp32"])
    params = restore_checkpoint(out, step=0)["esm_encoder"]

    cfg = ESM2Config(vocab_size=33, hidden_size=64, num_layers=3,
                     num_heads=4, intermediate_size=128)
    rng = np.random.default_rng(0)
    B, S = 2, 13
    ids = np.full((B, S), 1, dtype=np.int64)
    mask = np.zeros((B, S), dtype=np.int64)
    for b, L in enumerate((13, 7)):
        ids[b, 0] = 0
        ids[b, 1:L - 1] = rng.integers(4, 24, L - 2)
        ids[b, L - 1] = 2
        mask[b, :L] = 1
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)
                     ).last_hidden_state.numpy()
    got = np.asarray(esm2_encode(cfg, params, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-4, rtol=2e-4)


def test_esmc_pt_convert_matches_oracle(tmp_path):
    """esm-package .pt (full key layout incl. LN biases + sequence_head)
    through the CLI --esmc_path flow → forward matches the torch oracle."""
    import torch

    from prot2text_tpu.models.esmc import ESMCConfig, esmc_encode
    from tests.test_esmc_oracle import _batch, _random_sd, esmc_oracle

    cfg = ESMCConfig(vocab_size=64, d_model=64, n_layers=3, n_heads=4)
    sd = _random_sd(cfg, full_keys=True)
    pt_path = str(tmp_path / "esmc.pt")
    torch.save(sd, pt_path)

    out = str(tmp_path / "ckpt")
    convert_main(["--output_dir", out, "--esmc_path", pt_path,
                  "--esmc_num_layers", "3", "--dtype", "fp32"])
    params = restore_checkpoint(out, step=0)["esm_encoder"]

    ids, mask = _batch()
    want = esmc_oracle(sd, cfg, torch.as_tensor(ids),
                       torch.as_tensor(mask)).numpy()
    got = np.asarray(esmc_encode(cfg, params, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-4, rtol=2e-4)
