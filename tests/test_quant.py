"""Int8 weight-only quantization: numerics + end-to-end decode."""

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
    # nibble-packed along din: half the rows, int8 storage
    kq4 = q4["layers"]["q_proj"]["kernel_q4"]
    assert kq4.dtype == jnp.int8
    assert kq4.shape[-2] == params["layers"]["q_proj"]["kernel"].shape[-2] // 2

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
