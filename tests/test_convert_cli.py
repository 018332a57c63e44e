"""convert_checkpoint CLI: HF dir + reference adapter .pt → orbax tree."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_convert_llama_and_adapter(tmp_path):
    import torch
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_dir = str(tmp_path / "llama")
    m = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5))
    m.save_pretrained(hf_dir, safe_serialization=True)

    fc1 = torch.nn.Linear(8, 12)
    fc2 = torch.nn.Linear(12, 32)
    adapter_path = str(tmp_path / "adapter.pt")
    torch.save({
        "fc1.weight": fc1.weight, "fc1.bias": fc1.bias,
        "fc2.weight": fc2.weight, "fc2.bias": fc2.bias,
        "ln1.weight": torch.ones(12), "ln1.bias": torch.zeros(12),
        "ln2.weight": torch.ones(32), "ln2.bias": torch.zeros(32),
    }, adapter_path)

    from prot2text_tpu.cli.convert_checkpoint import main

    out = str(tmp_path / "out")
    main(["--output_dir", out, "--decoder_dir", hf_dir,
          "--adapter_path", adapter_path, "--dtype", "fp32"])

    from prot2text_tpu.core.checkpoint import restore_checkpoint

    tree = restore_checkpoint(out, step=0)
    assert set(tree) == {"llm_decoder", "adapter"}
    # round-trip numerics: converted kernel == torch weight.T
    np.testing.assert_allclose(
        np.asarray(tree["adapter"]["fc1"]["kernel"]),
        fc1.weight.detach().numpy().T, atol=1e-6)
    # layer count auto-detected from the state dict
    assert tree["llm_decoder"]["layers"]["q_proj"]["kernel"].shape[0] == 2


def test_convert_requires_a_source(tmp_path):
    from prot2text_tpu.cli.convert_checkpoint import main

    with pytest.raises(SystemExit):
        main(["--output_dir", str(tmp_path / "o")])
