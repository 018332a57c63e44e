"""Speculative decoding: exact greedy equivalence for ANY draft model.

The acceptance rule (keep the longest draft prefix matching the target
argmax, then take the target's own next token) makes greedy speculative
decoding output-identical to plain greedy decoding of the target — with a
GOOD draft it just gets there in fewer target forwards.  These tests verify
that invariant with (a) a perfect draft (= the target), (b) an unrelated
random draft, and (c) eos/padding handling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prot2text_tpu.infer.generate import GenerationConfig, generate
from prot2text_tpu.infer.speculative import speculative_generate
from prot2text_tpu.models.decoder import DecoderConfig, init_decoder_params


def _cfg(seed_dim=64):
    return DecoderConfig(vocab_size=96, hidden_size=seed_dim, num_layers=2,
                         num_heads=4, num_kv_heads=2, intermediate_size=128,
                         head_dim=16, rope_theta=1e4)


def _setup(B=2, P=6, eos=9999):
    cfg = _cfg()
    target = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    emb = jnp.asarray(rng.standard_normal((B, P, cfg.hidden_size))
                      .astype(np.float32))
    mask = np.ones((B, P), np.int64)
    mask[0, :2] = 0
    return cfg, target, emb, jnp.asarray(mask)


@pytest.mark.parametrize("gamma", [1, 3])
def test_spec_decode_exact_with_perfect_draft(gamma):
    cfg, target, emb, mask = _setup()
    gen_cfg = GenerationConfig(max_new_tokens=12, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg))
    got, n_fwd = speculative_generate(
        cfg, target, cfg, target, inputs_embeds=emb,
        draft_inputs_embeds=emb, attention_mask=mask, gen_cfg=gen_cfg,
        gamma=gamma)
    np.testing.assert_array_equal(np.asarray(got), want)
    # perfect draft accepts everything: ~NEW/(gamma+1) verify forwards
    assert int(n_fwd) <= 1 + int(np.ceil(12 / (gamma + 1))) + 1


def test_spec_decode_exact_with_random_draft():
    cfg, target, emb, mask = _setup()
    draft = init_decoder_params(cfg, jax.random.PRNGKey(42))  # unrelated
    gen_cfg = GenerationConfig(max_new_tokens=10, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg))
    got, n_fwd = speculative_generate(
        cfg, target, cfg, draft, inputs_embeds=emb,
        draft_inputs_embeds=emb, attention_mask=mask, gen_cfg=gen_cfg,
        gamma=3)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(n_fwd) <= 11  # never more verifies than plain decode steps


def test_spec_decode_eos_padding():
    """Find an eos id that actually triggers, then compare pad layout."""
    cfg, target, emb, mask = _setup()
    gen_cfg0 = GenerationConfig(max_new_tokens=8, eos_token_id=-1,
                                pad_token_id=95)
    free = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg0))
    eos = int(free[0, 3])  # force an eos mid-sequence for row 0
    gen_cfg = GenerationConfig(max_new_tokens=8, eos_token_id=eos,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg))
    got, _ = speculative_generate(
        cfg, target, cfg, target, inputs_embeds=emb,
        draft_inputs_embeds=emb, attention_mask=mask, gen_cfg=gen_cfg,
        gamma=2)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_spec_decode_batch_one_smaller_draft():
    """B=1 (the latency sweet spot) with a genuinely smaller draft stack."""
    cfg, target, emb, mask = _setup(B=2)
    emb, mask = emb[:1], mask[1:2] * 0 + 1
    small = DecoderConfig(vocab_size=96, hidden_size=32, num_layers=1,
                          num_heads=2, num_kv_heads=1, intermediate_size=64,
                          head_dim=16, rope_theta=1e4)
    draft = init_decoder_params(small, jax.random.PRNGKey(7))
    rng = np.random.default_rng(3)
    demb = jnp.asarray(rng.standard_normal((1, emb.shape[1], 32))
                       .astype(np.float32))
    gen_cfg = GenerationConfig(max_new_tokens=9, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg))
    got, _ = speculative_generate(
        cfg, target, small, draft, inputs_embeds=emb,
        draft_inputs_embeds=demb, attention_mask=mask, gen_cfg=gen_cfg,
        gamma=3)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("draft_layers,gamma", [(1, 2), (1, 4)])
def test_self_speculative_exact(draft_layers, gamma):
    """Self-draft (first-N layers + target lm_head) keeps greedy parity."""
    from prot2text_tpu.infer.speculative import self_speculative_generate

    cfg, target, emb, mask = _setup()
    gen_cfg = GenerationConfig(max_new_tokens=11, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg))
    got, n_fwd = self_speculative_generate(
        cfg, target, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=gen_cfg, draft_layers=draft_layers, gamma=gamma)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(n_fwd) <= 1 + 11   # never worse than one verify per token


def test_self_speculative_deeper_stack():
    """4-layer target, 2-layer self-draft: cache slice + num_layers scan."""
    from prot2text_tpu.infer.speculative import self_speculative_generate

    cfg = DecoderConfig(vocab_size=96, hidden_size=64, num_layers=4,
                        num_heads=4, num_kv_heads=2, intermediate_size=128,
                        head_dim=16, rope_theta=1e4)
    target = init_decoder_params(cfg, jax.random.PRNGKey(5))
    rng = np.random.default_rng(8)
    emb = jnp.asarray(rng.standard_normal((2, 5, 64)).astype(np.float32))
    mask = np.ones((2, 5), np.int64)
    mask[1, 0] = 0
    gen_cfg = GenerationConfig(max_new_tokens=10, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=jnp.asarray(mask),
                               gen_cfg=gen_cfg))
    got, _ = self_speculative_generate(
        cfg, target, inputs_embeds=emb, attention_mask=jnp.asarray(mask),
        gen_cfg=gen_cfg, draft_layers=2, gamma=3)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_self_speculative_validates_draft_layers():
    from prot2text_tpu.infer.speculative import self_speculative_generate

    cfg, target, emb, mask = _setup()
    gen_cfg = GenerationConfig(max_new_tokens=4, eos_token_id=9999,
                               pad_token_id=95)
    with pytest.raises(ValueError):
        self_speculative_generate(cfg, target, inputs_embeds=emb,
                                  attention_mask=mask, gen_cfg=gen_cfg,
                                  draft_layers=cfg.num_layers, gamma=2)


@pytest.mark.parametrize("ngram,gamma", [(2, 3), (3, 4)])
def test_prompt_lookup_exact(ngram, gamma):
    """Prompt-lookup drafts (any history) keep greedy output identical."""
    from prot2text_tpu.infer.speculative import prompt_lookup_generate
    cfg, target, emb, mask = _setup()
    gen_cfg = GenerationConfig(max_new_tokens=14, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg))
    got, n_fwd = prompt_lookup_generate(
        cfg, target, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=gen_cfg, gamma=gamma, ngram=ngram)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert 1 <= int(n_fwd) <= 14


def test_prompt_lookup_accelerates_repetitive_output():
    """Tiny random decoders degenerate into repeating tokens — exactly the
    regime n-gram lookup exploits; the verify-forward count must drop well
    below one-per-token."""
    from prot2text_tpu.infer.speculative import prompt_lookup_generate
    cfg, target, _, mask = _setup()
    # prompt seed chosen so BOTH rows settle into short-period repetition
    # early (row0 constant, row1 period 3 from ~index 10) — lockstep
    # batch-min acceptance needs every row to repeat before it can jump
    rng = np.random.default_rng(6)
    emb = jnp.asarray(rng.standard_normal((2, 6, cfg.hidden_size))
                      .astype(np.float32))
    gen_cfg = GenerationConfig(max_new_tokens=24, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg))
    # precondition for the acceleration claim: the tails actually repeat
    assert (want[:, -1] == want[:, -4]).all()
    assert (want[:, -2] == want[:, -5]).all()
    got, n_fwd = prompt_lookup_generate(
        cfg, target, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=gen_cfg, gamma=4, ngram=2)
    np.testing.assert_array_equal(np.asarray(got), want)
    # measured 16 verify forwards for 24 tokens; assert with slack
    assert int(n_fwd) <= 20


def test_prompt_lookup_with_prompt_ids():
    """Matches may come from supplied prompt token ids (mask respected)."""
    from prot2text_tpu.infer.speculative import prompt_lookup_generate
    cfg, target, emb, mask = _setup()
    gen_cfg = GenerationConfig(max_new_tokens=10, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg))
    rng = np.random.default_rng(3)
    pids = jnp.asarray(rng.integers(0, 96, (2, 8)), jnp.int32)
    pmask = jnp.asarray([[0, 0, 1, 1, 1, 1, 1, 1],
                         [1, 1, 1, 1, 1, 1, 1, 1]], jnp.int32)
    got, _ = prompt_lookup_generate(
        cfg, target, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=gen_cfg, prompt_ids=pids, prompt_ids_mask=pmask,
        gamma=3, ngram=2)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_prompt_lookup_int8_kv_matches_plain_int8_kv():
    """prompt_lookup_tokens + kv_bits=8: the speculative path over the
    int8 KV cache emits the SAME tokens as plain kv8 greedy (chunk
    quantize_kv is per-(head, token), so written cache values are
    identical; on CPU both run the XLA paths — the fused chunk-verify
    kernel engages on-chip for D=128 flagships)."""
    # int8 KV needs the bktd layout: D % 128 == 0
    cfg = DecoderConfig(vocab_size=96, hidden_size=128, num_layers=2,
                        num_heads=2, num_kv_heads=1, intermediate_size=128,
                        head_dim=128, rope_theta=1e4)
    target = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    emb = jnp.asarray(rng.standard_normal((2, 6, cfg.hidden_size))
                      .astype(np.float32))
    mask = np.ones((2, 6), np.int64)
    mask[0, :2] = 0
    mask = jnp.asarray(mask)
    gen_cfg = GenerationConfig(max_new_tokens=10, eos_token_id=9999,
                               pad_token_id=95)
    want = np.asarray(generate(cfg, target, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen_cfg,
                               kv_bits=8))
    spec_cfg = GenerationConfig(max_new_tokens=10, eos_token_id=9999,
                                pad_token_id=95, prompt_lookup_tokens=3)
    from prot2text_tpu.infer.generate import run_generation

    got = np.asarray(run_generation(
        cfg, target, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=spec_cfg, kv_bits=8))
    np.testing.assert_array_equal(got, want)
