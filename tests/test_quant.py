"""Int8 weight-only quantization: numerics + end-to-end decode."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from prot2text_tpu.infer.generate import GenerationConfig, generate
from prot2text_tpu.models.decoder import (
    causal_bias_from_mask, decoder_forward, decoder_logits, embed_tokens,
    init_decoder_params,
)
from prot2text_tpu.models.llama import LlamaConfig
from prot2text_tpu.models.quant import (
    quantize_leaf, quantize_params, quantized_bytes,
)


def test_quantize_leaf_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, scale = quantize_leaf(w)
    assert q.dtype == jnp.int8 and scale.shape == (1, 32)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    # max error bounded by half a quantization step per channel
    err = np.abs(deq - np.asarray(w))
    step = np.asarray(scale)[0]
    assert (err <= step * 0.5 + 1e-6).all()


def test_quantized_decoder_close_and_smaller():
    cfg = LlamaConfig.tiny(vocab_size=128)
    params = init_decoder_params(cfg.core(), jax.random.PRNGKey(0))
    qparams = quantize_params(params)

    # structure: targeted kernels replaced
    assert "kernel_q" in qparams["layers"]["q_proj"]
    assert "kernel" not in qparams["layers"]["q_proj"]
    assert "kernel_q" in qparams["lm_head"]
    # embeddings untouched
    assert qparams["embed_tokens"].dtype == params["embed_tokens"].dtype
    assert quantized_bytes(qparams) < 0.5 * quantized_bytes(params)

    ids = np.random.default_rng(1).integers(0, 128, (2, 10))
    mask = np.ones((2, 10), np.int64)
    emb = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.asarray(mask))
    pos = jnp.broadcast_to(jnp.arange(10), (2, 10))
    h_f, _ = decoder_forward(cfg.core(), params, inputs_embeds=emb,
                             bias=bias, positions=pos)
    h_q, _ = decoder_forward(cfg.core(), qparams, inputs_embeds=emb,
                             bias=bias, positions=pos)
    logits_f = np.asarray(decoder_logits(cfg.core(), params, h_f))
    logits_q = np.asarray(decoder_logits(cfg.core(), qparams, h_q))
    # int8 weight-only stays close in logit space for a 2-layer net
    assert np.abs(logits_q - logits_f).max() < 0.5
    # top-1 agreement on most positions
    agree = (logits_q.argmax(-1) == logits_f.argmax(-1)).mean()
    assert agree > 0.8


def test_quantized_generate_runs():
    cfg = LlamaConfig.tiny(vocab_size=128).core()
    params = quantize_params(init_decoder_params(cfg, jax.random.PRNGKey(2)))
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.standard_normal((2, 6, cfg.hidden_size))
                      .astype(np.float32))
    mask = jnp.ones((2, 6), jnp.int32)
    toks = generate(cfg, params, inputs_embeds=emb, attention_mask=mask,
                    gen_cfg=GenerationConfig(max_new_tokens=4,
                                             eos_token_id=127,
                                             pad_token_id=126))
    assert np.asarray(toks).shape == (2, 4)


def test_int4_quantization():
    from prot2text_tpu.models.quant import quantize_params

    cfg = LlamaConfig.tiny(vocab_size=128)
    params = init_decoder_params(cfg.core(), jax.random.PRNGKey(0))
    q4 = quantize_params(params, bits=4)
    # default format = nibble-PLANE i32 words: K/8 rows (round 3; exact —
    # the faster "pairs" format is opt-in because its epilogue correction
    # is not bit-exact, models/quant.py)
    kq4 = q4["layers"]["q_proj"]["kernel_q4p"]
    assert kq4.dtype == jnp.int32
    assert kq4.shape[-2] == params["layers"]["q_proj"]["kernel"].shape[-2] // 8
    # byte format still available and equivalent (see
    # test_int4_plane_format_matches_byte_format)
    qb = quantize_params(params, bits=4, int4_format="bytes")
    assert qb["layers"]["q_proj"]["kernel_q4"].dtype == jnp.int8

    ids = np.random.default_rng(1).integers(0, 128, (2, 8))
    mask = np.ones((2, 8), np.int64)
    emb = embed_tokens(params, jnp.asarray(ids))
    bias = causal_bias_from_mask(jnp.asarray(mask))
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    h4, _ = decoder_forward(cfg.core(), q4, inputs_embeds=emb, bias=bias,
                            positions=pos)
    hf_, _ = decoder_forward(cfg.core(), params, inputs_embeds=emb,
                             bias=bias, positions=pos)
    # int4 is lossier but must stay in the same ballpark
    rel = np.abs(np.asarray(h4) - np.asarray(hf_)).max() / (
        np.abs(np.asarray(hf_)).max() + 1e-9)
    assert rel < 0.3, rel


@pytest.mark.slow
def test_qlora_sft_step_on_int8_base():
    """QLoRA-style: LoRA side paths train over an int8 weight-only frozen
    base (kernel_q leaves are valid LoRA targets; gradients flow through
    the mixed-dtype dot).  Loss finite, LoRA grads nonzero."""
    import jax
    import numpy as np

    from prot2text_tpu.models.adapters import ModalityAdapterConfig
    from prot2text_tpu.models.composed import ESMCQwen, ESMCQwenConfig
    from prot2text_tpu.models.esmc import ESMCConfig
    from prot2text_tpu.models.lora import LoraConfig, init_lora_params
    from prot2text_tpu.models.qwen3 import Qwen3Config
    from prot2text_tpu.models.quant import quantize_params
    from prot2text_tpu.train.optim import TrainState, adamw_constant
    from prot2text_tpu.train.sft import SFTConfig, make_sft_train_step

    cfg = ESMCQwenConfig(
        esm_config=ESMCConfig(d_model=64, n_layers=2, n_heads=4),
        adapter_config=ModalityAdapterConfig(64, 64, 64),
        llm_config=Qwen3Config(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16, intermediate_size=128),
        placeholder_id=99)
    model = ESMCQwen(cfg)
    frozen = {
        "esm_encoder": quantize_params(model.params["esm_encoder"], bits=8),
        "llm_decoder": quantize_params(model.params["llm_decoder"], bits=8),
        "adapter": model.params["adapter"],
    }
    lora_cfg = LoraConfig(r=4, alpha=8)
    lora_llm = init_lora_params(lora_cfg, frozen["llm_decoder"],
                                jax.random.PRNGKey(1))
    # int8 leaves must actually be targeted
    n_adapted = sum(
        1 for leaf in jax.tree_util.tree_leaves(
            lora_llm, is_leaf=lambda x: isinstance(x, dict)
            and "A" in x)
        if isinstance(leaf, dict))
    assert n_adapted > 0, "no LoRA targets found on the quantized base"
    trainable = {
        "lora_esm": init_lora_params(lora_cfg, frozen["esm_encoder"],
                                     jax.random.PRNGKey(2)),
        "lora_llm": lora_llm,
        "adapter": model.params["adapter"],
    }
    tx = adamw_constant(1e-3)
    state = TrainState.create(trainable, tx)
    step = jax.jit(make_sft_train_step(
        esm_config=cfg.esm_config, adapter_config=cfg.adapter_config,
        decoder_core=cfg.llm_config.core(),
        cfg=SFTConfig(lora=lora_cfg, placeholder_id=99, remat=False), tx=tx))

    import __graft_entry__

    batch = __graft_entry__._batch(B=4)
    state2, loss = step(state, frozen, batch, jax.random.PRNGKey(0))
    loss = float(loss)
    assert np.isfinite(loss), loss
    # B matrices start at zero; after one adamw step they must move
    moved = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        state2.params["lora_llm"], 0.0)
    assert moved > 0.0


def test_int4_plane_format_matches_byte_format():
    """int4_format='planes' (i32 nibble-plane words) holds the SAME logical
    weights as the split-half byte format — greedy generation identical."""
    import jax
    import numpy as np

    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.decoder import DecoderConfig, init_decoder_params
    from prot2text_tpu.models.quant import quantize_params

    cfg = DecoderConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, head_dim=16,
        rope_theta=10000.0)
    base = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qb = quantize_params(base, bits=4, int4_format="bytes")
    qp = quantize_params(base, bits=4, int4_format="planes")
    assert "kernel_q4p" in qp["layers"]["q_proj"]

    from prot2text_tpu.kernels.quant_matmul import (
        unpack_int4, unpack_int4_planes)

    np.testing.assert_array_equal(
        np.asarray(unpack_int4(qb["layers"]["q_proj"]["kernel_q4"])),
        np.asarray(unpack_int4_planes(qp["layers"]["q_proj"]["kernel_q4p"])))

    rng = np.random.default_rng(0)
    emb = jax.numpy.asarray(rng.standard_normal((2, 6, 64)),
                            jax.numpy.float32)
    mask = jax.numpy.ones((2, 6), jax.numpy.int32)
    gc = GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0)
    tb = np.asarray(generate(cfg, qb, inputs_embeds=emb, attention_mask=mask,
                             gen_cfg=gc, cache_dtype=jax.numpy.float32))
    tp = np.asarray(generate(cfg, qp, inputs_embeds=emb, attention_mask=mask,
                             gen_cfg=gc, cache_dtype=jax.numpy.float32))
    np.testing.assert_array_equal(tb, tp)


def test_int4_pair_format_matches_byte_format():
    """int4_format='pairs' (bf16-pair i32 words) holds the SAME logical
    weights as the split-half byte format — greedy generation identical
    on CPU, where both run the exact XLA unpack fallback.  (The on-chip
    Pallas pair kernel is validated to ~1e-4 absolute by
    scripts/bench_int4_pairs.py; its epilogue correction is deliberately
    NOT bit-exact, which is why 'planes' stays the default format —
    models/quant.py.)"""
    import jax
    import numpy as np

    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.decoder import DecoderConfig, init_decoder_params
    from prot2text_tpu.models.quant import quantize_params

    cfg = DecoderConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, head_dim=16,
        rope_theta=10000.0)
    base = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qb = quantize_params(base, bits=4, int4_format="bytes")
    qw = quantize_params(base, bits=4, int4_format="pairs")
    assert "kernel_q4w" in qw["layers"]["q_proj"]

    from prot2text_tpu.kernels.quant_matmul import (
        unpack_int4, unpack_int4_pairs)

    np.testing.assert_array_equal(
        np.asarray(unpack_int4(qb["layers"]["q_proj"]["kernel_q4"])),
        np.asarray(unpack_int4_pairs(qw["layers"]["q_proj"]["kernel_q4w"])))

    rng = np.random.default_rng(0)
    emb = jax.numpy.asarray(rng.standard_normal((2, 6, 64)),
                            jax.numpy.float32)
    mask = jax.numpy.ones((2, 6), jax.numpy.int32)
    gc = GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0)
    tb = np.asarray(generate(cfg, qb, inputs_embeds=emb, attention_mask=mask,
                             gen_cfg=gc, cache_dtype=jax.numpy.float32))
    tw = np.asarray(generate(cfg, qw, inputs_embeds=emb, attention_mask=mask,
                             gen_cfg=gc, cache_dtype=jax.numpy.float32))
    np.testing.assert_array_equal(tb, tw)
