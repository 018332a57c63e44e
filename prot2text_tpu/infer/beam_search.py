"""Beam search over a preallocated KV cache.

The reference gets beams for free from HF GenerationMixin (`--num_beams`,
generate_instruct.py:43); here it is a device-side jitted loop (SURVEY.md §7
hard part #6):

  * beams live as an expanded batch (B*K) over the same cache layout as
    greedy decode — beam reordering is ONE gather of the (L, T, B*K, Hkv, D)
    cache per step
  * alive/finished split: each step takes top-2K candidates, keeps the best
    K non-EOS as alive and folds EOS candidates into the finished set
  * HF scoring parity: finished hypothesis score = sum(logp) /
    len**length_penalty (BeamHypotheses.add), early_stopping=False semantics
    — decoding runs to max_new_tokens, then the best finished beam (or best
    alive if none finished) is returned
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.decoder import (
    DecoderConfig, decoder_decode_step, decoder_forward, decoder_logits,
)
from .generate import (
    GenerationConfig, _bias_from_kv_mask, _prefill_bias, filter_logits,
)
from .kvcache import init_kv_cache

NEG_INF = -1.0e7


def _expand_beams(x, K):
    """(B, ...) → (B*K, ...) by repeat."""
    return jnp.repeat(x, K, axis=0)


def _warp_rows(logp, gen_cfg: GenerationConfig):
    """Beam-sample warping, HF placement: transformers >=4.45 merges the
    warpers (temperature → top-k → top-p) into the logits_processor list,
    applied to each beam's (B*K, V) log-softmax row BEFORE the cumulative
    beam scores are added (generation/utils.py:3283-3314 in 4.57) — so the
    accumulated score is a SUM of warped per-token log-probs and never
    explodes at small temperatures.  No-op for greedy beams."""
    if not gen_cfg.do_sample:
        return logp
    return filter_logits(logp, gen_cfg)


def _select_candidates(cand, n, gen_cfg: GenerationConfig, key):
    """Top-n candidate selection over (B, K, V) accumulated scores (K=1
    for the step-0 prompt distribution); returns ((B, n) scores, flat K*V
    ids).  Greedy beams: plain top_k over the flat (B, K*V).  Beam-SAMPLE
    (HF do_sample=True with num_beams>1): n candidates are drawn WITHOUT
    replacement from softmax of the flat accumulated scores
    (torch.multinomial in _get_top_k_continuations,
    generation/utils.py:3012-3016 — realized exactly by Gumbel-top-k) and
    keep their accumulated scores for beam bookkeeping."""
    B, K, V = cand.shape
    flat = cand.reshape(B, K * V)
    if not gen_cfg.do_sample:
        return jax.lax.top_k(flat, n)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, flat.shape, minval=1e-20, maxval=1.0)))
    _, idx = jax.lax.top_k(flat + gumbel, n)
    return jnp.take_along_axis(flat, idx, axis=1), idx


@functools.partial(
    jax.jit, static_argnames=("cfg", "gen_cfg", "num_beams", "attn_impl",
                              "cache_dtype", "length_penalty",
                              "early_stopping"))
def beam_search(
    cfg: DecoderConfig,
    params,
    *,
    inputs_embeds,       # (B, P, H) left-padded prompt embeddings
    attention_mask,      # (B, P)
    gen_cfg: GenerationConfig,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    attn_impl: str = "xla",
    cache_dtype=None,
    rng: Optional[jax.Array] = None,
):
    """Returns (B, max_new_tokens) int32 best-beam tokens (new tokens only,
    pad-filled after EOS)."""
    B, P, H = inputs_embeds.shape
    K = num_beams
    NEW = gen_cfg.max_new_tokens
    T = P + NEW
    V = cfg.vocab_size
    dtype = cache_dtype or inputs_embeds.dtype
    eos = gen_cfg.eos_token_id
    pad = gen_cfg.pad_token_id

    positions = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, 0,
                         None).astype(jnp.int32)
    last_pos = positions[:, -1]                      # (B,)

    # prefill ONCE at batch B, then expand the cache to B*K
    cache_b = init_kv_cache(cfg, B, T, dtype)
    bias = _prefill_bias(attention_mask, T)
    from ..models.decoder import contiguous_lengths

    h, cache_b = decoder_forward(
        cfg, params, inputs_embeds=inputs_embeds.astype(dtype), bias=bias,
        positions=positions, kv_cache=cache_b, cache_index=0,
        attn_impl="flash" if attn_impl == "auto" else attn_impl,
        attn_lengths=contiguous_lengths(attention_mask))
    logp0 = _warp_rows(jax.nn.log_softmax(
        decoder_logits(cfg, params, h[:, -1:])[:, 0], axis=-1),
        gen_cfg)                                                # (B, V)

    from .kvcache import batch_axis

    bax = batch_axis(cfg)
    cache = {k: jnp.repeat(v, K, axis=bax) for k, v in cache_b.items()}
    kv_mask = _expand_beams(attention_mask.astype(jnp.int32), K)  # (B*K, P)
    kv_mask = jnp.concatenate(
        [kv_mask, jnp.zeros((B * K, NEW), jnp.int32)], axis=1)
    last_pos_k = _expand_beams(last_pos, K)          # (B*K,)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, key0 = jax.random.split(rng)

    # step 0: top-K (or, under do_sample, K sampled without replacement)
    # tokens of the prompt distribution seed the beams
    top0_scores, top0_tokens = _select_candidates(
        logp0[:, None, :], K, gen_cfg, key0)
    alive_tokens = jnp.full((B, K, NEW), pad, jnp.int32)
    alive_tokens = alive_tokens.at[:, :, 0].set(top0_tokens)
    alive_scores = top0_scores                              # (B, K)
    # a beam whose FIRST token is eos finishes immediately
    fin0 = top0_tokens == eos
    finished_tokens = jnp.where(
        fin0[..., None], alive_tokens, jnp.full_like(alive_tokens, pad))
    finished_scores = jnp.where(
        fin0, alive_scores / (1.0 ** length_penalty),
        jnp.full_like(alive_scores, NEG_INF))
    alive_scores = jnp.where(fin0, NEG_INF, alive_scores)

    def _n_finished(finished_scores):
        return (finished_scores > NEG_INF / 2).sum(axis=1)  # (B,)

    def body(t, state):
        (alive_tokens, alive_scores, finished_tokens, finished_scores,
         cache, kv_mask, rng) = state
        # HF BeamHypotheses.is_done with early_stopping=True: a batch row
        # stops accepting hypotheses once K are banked (checked BEFORE the
        # step's candidates are processed)
        done = jnp.logical_and(
            bool(early_stopping), _n_finished(finished_scores) >= K)  # (B,)
        prev = alive_tokens[:, :, t - 1].reshape(B * K)        # (B*K,)
        emb = params["embed_tokens"][prev][:, None, :].astype(dtype)
        pos = (last_pos_k + t)[:, None]
        bias_t = _bias_from_kv_mask(kv_mask, 1)   # already-written slots only
        h, cache = decoder_decode_step(
            cfg, params, token_embeds=emb, bias_old=bias_t, positions=pos,
            kv_cache=cache, cache_index=P + t - 1)
        kv_mask = jax.lax.dynamic_update_slice(
            kv_mask, jnp.ones((B * K, 1), jnp.int32), (0, P + t - 1))
        logp = _warp_rows(jax.nn.log_softmax(
            decoder_logits(cfg, params, h)[:, 0], axis=-1),
            gen_cfg)                                           # (B*K, V)
        logp = logp.reshape(B, K, V)

        cand = alive_scores[:, :, None] + logp                 # (B, K, V)
        rng, key_t = jax.random.split(rng)
        top_scores, top_idx = _select_candidates(
            cand, 2 * K, gen_cfg, key_t)                       # (B, 2K)
        top_beam = top_idx // V
        top_token = top_idx % V
        is_eos = top_token == eos

        # gather candidate sequences (B, 2K, NEW); eos stays in the output
        # (HF finalize appends eos after the hypothesis)
        cand_tokens = jnp.take_along_axis(
            alive_tokens, top_beam[..., None], axis=1)
        cand_tokens = cand_tokens.at[:, :, t].set(top_token)

        # alive: best K non-eos
        alive_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        new_alive_scores, alive_sel = jax.lax.top_k(alive_cand_scores, K)
        new_alive_tokens = jnp.take_along_axis(
            cand_tokens, alive_sel[..., None], axis=1)
        new_alive_beam = jnp.take_along_axis(top_beam, alive_sel, axis=1)

        # finished: eos candidates merged with the pool.  HF BeamHypotheses
        # normalizes by the hypothesis length EXCLUDING the final eos (= t
        # generated tokens) while the score sum includes the eos logp.
        hyp_len = jnp.maximum(t, 1).astype(jnp.float32)
        fin_cand_scores = jnp.where(
            is_eos, top_scores / (hyp_len ** length_penalty), NEG_INF)
        pool_scores = jnp.concatenate(
            [finished_scores, fin_cand_scores], axis=1)        # (B, K+2K)
        pool_tokens = jnp.concatenate(
            [finished_tokens, cand_tokens], axis=1)
        new_fin_scores, fin_sel = jax.lax.top_k(pool_scores, K)
        new_fin_tokens = jnp.take_along_axis(
            pool_tokens, fin_sel[..., None], axis=1)

        # reorder cache to follow the alive beams — one gather of the
        # cache's batch axis per step
        flat_sel = (jnp.arange(B)[:, None] * K + new_alive_beam).reshape(-1)
        cache = {k: jnp.take(v, flat_sel, axis=bax)
                 for k, v in cache.items()}

        # done rows freeze: no new hypotheses, alive state irrelevant
        if early_stopping:
            d1, d2 = done[:, None], done[:, None, None]
            new_alive_tokens = jnp.where(d2, alive_tokens, new_alive_tokens)
            new_alive_scores = jnp.where(d1, alive_scores, new_alive_scores)
            new_fin_tokens = jnp.where(d2, finished_tokens, new_fin_tokens)
            new_fin_scores = jnp.where(d1, finished_scores, new_fin_scores)

        return (new_alive_tokens, new_alive_scores, new_fin_tokens,
                new_fin_scores, cache, kv_mask, rng)

    state = (alive_tokens, alive_scores, finished_tokens, finished_scores,
             cache, kv_mask, rng)
    if early_stopping:
        # stop the whole decode once every batch row banked K hypotheses
        def cond(carry):
            t, st = carry
            return jnp.logical_and(
                t < NEW, ~jnp.all(_n_finished(st[3]) >= K))

        def wbody(carry):
            t, st = carry
            return t + 1, body(t, st)

        _, state = jax.lax.while_loop(cond, wbody, (jnp.asarray(1), state))
    else:
        state = jax.lax.fori_loop(1, NEW, body, state)
    (alive_tokens, alive_scores, finished_tokens, finished_scores,
     _, _, _) = state

    # HF finalize: alive beams join the pool (normalized at full length)
    # ONLY for rows that are not done (with early_stopping a done row's
    # output comes from the banked hypotheses alone)
    alive_norm = alive_scores / (float(NEW) ** length_penalty)
    has_fin = finished_scores[:, 0] > NEG_INF / 2
    best_fin = finished_tokens[:, 0]
    best_alive = alive_tokens[:, 0]
    best_alive_better = alive_norm[:, 0] > finished_scores[:, 0]
    use_alive = jnp.logical_or(~has_fin, best_alive_better)
    if early_stopping:
        done_final = _n_finished(finished_scores) >= K
        use_alive = jnp.logical_and(use_alive, ~done_final)
    return jnp.where(use_alive[:, None], best_alive, best_fin)
