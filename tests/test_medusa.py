"""Medusa learned draft heads (models/medusa.py, train/draft.py, serving
integration): draft semantics, engine greedy-exactness for ANY head
weights, and the distillation step actually improving acceptance (fewer
verify rounds) on the target's own outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from prot2text_tpu.infer.serving import ContinuousBatcher
from prot2text_tpu.models.decoder import (
    DecoderConfig, decoder_logits, embed_tokens, init_decoder_params,
)
from prot2text_tpu.models.medusa import (
    MedusaConfig, init_medusa_params, medusa_drafts,
)
from prot2text_tpu.train.draft import make_medusa_train_step
from prot2text_tpu.train.optim import TrainState, adamw_constant

CFG = DecoderConfig(vocab_size=64, hidden_size=64, num_layers=2,
                    num_heads=4, num_kv_heads=2, intermediate_size=128,
                    head_dim=16, rope_theta=10000.0)
PAD = 8
K = 3


def _params():
    return init_decoder_params(CFG, jax.random.PRNGKey(0))


def _requests(n=4, budget=12):
    rng = np.random.default_rng(7)
    return [(i, rng.standard_normal(
        (2 + i % 5, CFG.hidden_size)).astype(np.float32), budget)
        for i in range(n)]


def _serve(params, reqs, medusa_params=None):
    eng = ContinuousBatcher(CFG, params, max_slots=4, max_len=PAD + 14,
                            prompt_pad=PAD, eos_token_id=-1,
                            cache_dtype=jnp.float32,
                            medusa_params=medusa_params)
    for rid, emb, budget in reqs:
        eng.submit(rid, emb, max_new_tokens=budget)
    return {k: list(v) for k, v in eng.run()}, eng.steps


def test_zero_init_drafts_repeat_frontier():
    """Zero-init heads are identity residual blocks: every head drafts
    argmax(lm_head(h)) — the token the frontier already emitted."""
    params = _params()
    med = init_medusa_params(MedusaConfig(CFG.hidden_size, K),
                             jax.random.PRNGKey(1))
    h = jax.random.normal(jax.random.PRNGKey(2), (5, CFG.hidden_size))
    d = np.asarray(medusa_drafts(CFG, params, med, h))
    base = np.asarray(jnp.argmax(decoder_logits(CFG, params, h), axis=-1))
    np.testing.assert_array_equal(d, np.tile(base[:, None], (1, K)))


def test_engine_medusa_matches_plain():
    """Greedy-exactness for arbitrary (untrained, non-zero) head weights:
    the acceptance rule keeps the engine output identical to plain."""
    params = _params()
    reqs = _requests()
    plain, _ = _serve(params, reqs)
    med = init_medusa_params(MedusaConfig(CFG.hidden_size, K),
                             jax.random.PRNGKey(3), scale=0.3)
    spec, _ = _serve(params, reqs, medusa_params=med)
    assert plain == spec


def test_training_improves_acceptance():
    """Distilling the heads on the target's own engine outputs (with the
    prompt embeddings in context) drives the CE down and the number of
    verify rounds below the untrained baseline, while outputs stay
    greedy-exact."""
    params = _params()
    reqs = _requests()
    plain, _ = _serve(params, reqs)

    # training batch = the exact serving sequences: [left-padded prompt
    # embeddings ; embedded generated tokens], labels -100 on the prompt
    B = len(reqs)
    S = PAD + max(len(v) for v in plain.values())
    emb = np.zeros((B, S, CFG.hidden_size), np.float32)
    mask = np.zeros((B, S), np.int32)
    labels = np.full((B, S), -100, np.int32)
    for i, (rid, pemb, _) in enumerate(reqs):
        P = pemb.shape[0]
        emb[i, PAD - P:PAD] = pemb
        mask[i, PAD - P:PAD] = 1
        toks = plain[rid]
        tok_emb = np.asarray(embed_tokens(params, jnp.asarray(toks)))
        emb[i, PAD:PAD + len(toks)] = tok_emb
        mask[i, PAD:PAD + len(toks)] = 1
        labels[i, PAD:PAD + len(toks)] = toks
    batch = {"inputs_embeds": jnp.asarray(emb),
             "attention_mask": jnp.asarray(mask),
             "labels": jnp.asarray(labels)}

    mcfg = MedusaConfig(CFG.hidden_size, K)
    # separate copies: the train step DONATES its state, so the serving
    # baseline needs its own (zero-init is deterministic anyway)
    med_zero = init_medusa_params(mcfg, jax.random.PRNGKey(4))
    tx = adamw_constant(5e-3)
    state = TrainState.create(init_medusa_params(mcfg, jax.random.PRNGKey(4)),
                              tx)
    step = make_medusa_train_step(CFG, tx)
    state, loss0 = step(state, params, batch)
    for _ in range(300):
        state, loss = step(state, params, batch)
    assert float(loss) < 0.5 * float(loss0), (float(loss0), float(loss))

    out_zero, steps_zero = _serve(params, reqs, medusa_params=med_zero)
    out_trained, steps_trained = _serve(params, reqs,
                                        medusa_params=state.params)
    assert out_zero == plain and out_trained == plain
    assert steps_trained < steps_zero, (steps_trained, steps_zero)


def test_medusa_rejects_ngram_combo():
    params = _params()
    med = init_medusa_params(MedusaConfig(CFG.hidden_size, K),
                             jax.random.PRNGKey(5))
    try:
        ContinuousBatcher(CFG, params, max_slots=2, max_len=PAD + 6,
                          prompt_pad=PAD, eos_token_id=-1,
                          cache_dtype=jnp.float32, medusa_params=med,
                          prompt_lookup_tokens=2)
    except ValueError as e:
        assert "mutually exclusive" in str(e)
    else:
        raise AssertionError("expected ValueError")
