"""Greedy speculative decoding with a draft model (serving latency feature).

Beyond reference parity: the reference decodes strictly one token per
target-model forward (HF GenerationMixin).  Here a small draft decoder
proposes `gamma` tokens autoregressively and the target verifies them in ONE
chunk forward; since decode is HBM-bandwidth-bound (weights re-read per
step), a verify over gamma+1 positions costs about the same as one step, so
throughput multiplies by the mean accepted length.

Exactness: greedy speculative decoding is output-IDENTICAL to plain greedy
decoding of the target for ANY draft (the acceptance rule keeps the longest
prefix where draft tokens equal the target argmax, then takes the target's
own next token) — tested in tests/test_speculative.py against generate().

Batching: rows advance in LOCKSTEP by the batch-minimum accepted length
(finished rows don't hold the batch back).  This keeps every cache write a
scalar-indexed static slab (no per-row scatter) and targets the
latency-sensitive small-batch serving regime where speculative decoding
pays off; at B=1 it is exactly standard speculative decoding.

Cache handling: rejected drafts leave stale kv in slots beyond the accepted
point; correctness follows because kv validity is tracked by kv_mask and the
slots are rewritten by the next iteration's catch-up chunk.  The draft model
never sees tokens it didn't draft until the catch-up chunk replays the
accepted tokens through it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.decoder import (
    DecoderConfig, decoder_decode_step, decoder_forward, decoder_logits,
)
from .generate import GenerationConfig, _bias_from_kv_mask, _prefill_bias
from .kvcache import init_kv_cache


def _chunk_bias(kv_mask, G: int, chunk_start, dtype=jnp.float32):
    """(B, T) validity of already-written slots + causal within the G-token
    chunk that will occupy slots [chunk_start, chunk_start+G)."""
    B, T = kv_mask.shape
    neg = jnp.finfo(dtype).min
    ok_old = kv_mask[:, None, None, :].astype(bool)          # (B,1,1,T)
    ok_old = jnp.broadcast_to(ok_old, (B, 1, G, T))
    cols = jnp.arange(T)[None, None, None, :]
    rows = jnp.arange(G)[None, None, :, None]
    in_chunk = jnp.logical_and(
        cols >= chunk_start, cols <= chunk_start + rows)      # causal
    ok = jnp.logical_or(ok_old, in_chunk)
    return jnp.where(ok, jnp.zeros([], dtype), jnp.full([], neg, dtype))


def _verify_accept(cfg, params, *, tokens, tgt_cache, kv_mask, finished,
                   prev, drafts, t, base, pos_base, gamma, eos, pad,
                   dtype, attn_impl, fused_ok: bool = False):
    """Target verification of a drafted chunk + the exact greedy acceptance
    rule, shared by every speculative variant (model-draft, self-draft,
    prompt-lookup): one G=gamma+1-token target forward over
    [prev, drafts...], accept the longest prefix where draft == target
    argmax, emit the target's own token at the first mismatch (bonus), and
    advance the whole batch by the batch-minimum acceptance (lockstep —
    every cache write stays a scalar-indexed static slab).

    Returns (tokens, tgt_cache, kv_mask, finished, a) with `a` the scalar
    accepted-draft count (0..gamma)."""
    B, G = drafts.shape[0], gamma + 1
    T = kv_mask.shape[1]
    chunk_toks = jnp.concatenate([prev[:, None], drafts], axis=1)   # (B, G)
    chunk_emb = params["embed_tokens"][chunk_toks].astype(dtype)
    pos = pos_base[:, None] + jnp.arange(G)[None, :]
    from ..models.decoder import (
        decoder_verify_chunk, supports_verify_chunk_step)

    # `fused_ok` is the CALLER's static proof that every chunk start obeys
    # the kernel's slot <= T - 64 precondition (base is a traced value, so
    # it cannot be checked here; prompt_lookup_generate asserts
    # T - 64 >= P + NEW on its static shapes before passing True).  A
    # caller that sizes its cache without the slack must leave this False
    # or the aliased kernel write would land past the cache end.
    if (fused_ok and isinstance(tgt_cache, dict) and "k_scale" in tgt_cache
            and supports_verify_chunk_step(cfg, tgt_cache, G,
                                           params=params)):
        h, tgt_cache = decoder_verify_chunk(
            cfg, params, token_embeds=chunk_emb, kv_mask01=kv_mask,
            positions=pos, kv_cache=tgt_cache,
            cache_index=jnp.broadcast_to(
                jnp.asarray(base, jnp.int32).reshape(-1), (B,)))
    else:
        bias = _chunk_bias(kv_mask, G, base)
        h, tgt_cache = decoder_forward(
            cfg, params, inputs_embeds=chunk_emb, bias=bias,
            positions=pos, kv_cache=tgt_cache, cache_index=base,
            attn_impl=attn_impl)
    tgt_greedy = jnp.argmax(
        decoder_logits(cfg, params, h), axis=-1).astype(jnp.int32)  # (B, G)

    match = drafts == tgt_greedy[:, :gamma]                   # (B, gamma)
    acc = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
    acc_eff = jnp.where(finished, gamma, acc)
    a = jnp.min(acc_eff)                                      # scalar
    out_chunk = jnp.concatenate(
        [drafts, tgt_greedy[:, -1:]], axis=1)                 # (B, G)
    bonus = jnp.take_along_axis(tgt_greedy, a[None].repeat(B)[:, None],
                                axis=1)[:, 0]
    out_chunk = jnp.where(
        jnp.arange(G)[None, :] == a, bonus[:, None], out_chunk)
    keep = jnp.arange(G)[None, :] <= a                        # (B, G)

    eos_hit = jnp.logical_and(keep, out_chunk == eos)
    after_eos = jnp.cumsum(
        jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                         eos_hit.astype(jnp.int32)[:, :-1]], axis=1),
        axis=1) > 0
    emit = jnp.where(
        jnp.logical_or(~keep, finished[:, None] | after_eos),
        pad, out_chunk)
    tokens = jax.lax.dynamic_update_slice(tokens, emit, (0, t))
    finished = jnp.logical_or(finished, eos_hit.any(axis=1))

    slot_idx = jnp.arange(kv_mask.shape[1])[None, :]
    newly_valid = jnp.logical_and(
        slot_idx >= base, slot_idx < base + 1 + a)
    kv_mask = jnp.where(newly_valid, 1, kv_mask)
    return tokens, tgt_cache, kv_mask, finished, a


@functools.partial(
    jax.jit,
    static_argnames=("target_cfg", "draft_cfg", "gen_cfg", "gamma",
                     "attn_impl", "cache_dtype", "draft_num_layers"),
)
def speculative_generate(
    target_cfg: DecoderConfig,
    target_params,
    draft_cfg: DecoderConfig,
    draft_params,
    *,
    inputs_embeds,          # (B, P, H_target) left-padded prompt embeddings
    draft_inputs_embeds,    # (B, P, H_draft) same prompt in draft's embedding
    attention_mask,         # (B, P)
    gen_cfg: GenerationConfig,
    gamma: int = 4,
    attn_impl: str = "xla",
    cache_dtype=None,
    draft_num_layers: Optional[int] = None,
):
    """Returns (tokens (B, max_new), n_target_forwards scalar).  Greedy only
    (gen_cfg.do_sample/num_beams must be off).

    draft_num_layers=N turns on SELF-speculative (early-exit / LayerSkip
    style) drafting: draft_cfg/draft_params must be the target's own — the
    draft runs only the target's first N layers (no weight copies: the
    layer scan indexes the full stacked params) and reads the target's own
    final norm + lm_head on the layer-N hidden state.  The draft prefill is
    FREE: layers 0..N-1 of the target's prompt cache are identical to what
    an N-layer prefill would write (same weights, same inputs), so the
    draft cache starts as a slice of the target cache."""
    B, P, _ = inputs_embeds.shape
    NEW = gen_cfg.max_new_tokens
    G = gamma + 1
    # slot budget: prompt + generated + one slack chunk (verify writes up to
    # G slots beyond the accepted point before they are overwritten)
    T = P + NEW + G
    eos, pad = gen_cfg.eos_token_id, gen_cfg.pad_token_id
    dtype = cache_dtype or inputs_embeds.dtype

    positions = jnp.clip(
        jnp.cumsum(attention_mask, axis=1) - 1, 0, None).astype(jnp.int32)
    last_pos = positions[:, -1]                              # (B,)

    # --- prefill both models
    def prefill(cfg, params, emb):
        cache = init_kv_cache(cfg, B, T, dtype)
        bias = _prefill_bias(attention_mask, T)
        h, cache = decoder_forward(
            cfg, params, inputs_embeds=emb.astype(dtype), bias=bias,
            positions=positions, kv_cache=cache, cache_index=0,
            attn_impl=attn_impl)
        return decoder_logits(cfg, params, h[:, -1:])[:, 0], cache

    tgt_logits0, tgt_cache = prefill(target_cfg, target_params, inputs_embeds)
    if draft_num_layers is not None:
        # self-draft: the first N layers of the target cache ARE the draft
        # prefill (identical weights + inputs) — slice instead of recompute
        drf_cache = {"k": tgt_cache["k"][:draft_num_layers],
                     "v": tgt_cache["v"][:draft_num_layers]}
    else:
        _, drf_cache = prefill(draft_cfg, draft_params, draft_inputs_embeds)

    tok0 = jnp.argmax(tgt_logits0, axis=-1).astype(jnp.int32)
    tokens = jnp.full((B, NEW + G), pad, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    finished0 = tok0 == eos

    kv_mask0 = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.zeros((B, NEW + G), jnp.int32)], axis=1)        # (B, T)
    # draft has NOT consumed tok0 yet; both models' caches hold the prompt

    def emb_of(params, tok):
        return params["embed_tokens"][tok].astype(dtype)

    def cond(state):
        (t, _, _, _, _, finished, _) = state
        return jnp.logical_and(t < NEW, ~jnp.all(finished))

    def body(state):
        (t, tokens, tgt_cache, drf_cache, kv_mask, finished, n_fwd) = state
        # slots [P, P+t) hold generated tokens 0..t-1; token t-1 is the last
        # accepted (not yet fed to either model).  This iteration drafts
        # gamma tokens after it, then the target verifies the G-chunk
        # [tokens[t-1], d_0, ..., d_{gamma-1}] occupying slots [P+t-1+1 ...
        # actually the chunk WRITES slots [P+t-1, P+t+gamma) for its own kv.
        base = P + t - 1            # slot of token t-1 (to be written now)
        pos_base = last_pos + t     # rope position of token t-1

        # --- draft gamma tokens autoregressively (with catch-up: the first
        # draft step consumes tokens[t-1], which the draft never saw).
        # gamma+1 steps run: the final step emits no kept token but WRITES
        # the kv of the last draft (slot base+gamma), which stays in the
        # draft's context when all gamma drafts are accepted — without it
        # the shared kv_mask would point the next iteration's draft at a
        # zero kv slot and acceptance collapses.
        def draft_step(j, carry):
            drf_cache, kv_m, prev, drafts = carry
            bias = _bias_from_kv_mask(kv_m, 1)
            h, drf_cache = decoder_decode_step(
                draft_cfg, draft_params, token_embeds=emb_of(
                    draft_params, prev)[:, None, :],
                bias_old=bias, positions=(pos_base + j)[:, None],
                kv_cache=drf_cache, cache_index=base + j,
                num_layers=draft_num_layers)
            kv_m = jax.lax.dynamic_update_slice(
                kv_m, jnp.ones((B, 1), jnp.int32), (0, base + j))
            d = jnp.argmax(
                decoder_logits(draft_cfg, draft_params, h)[:, 0],
                axis=-1).astype(jnp.int32)
            drafts = jax.lax.dynamic_update_slice(
                drafts, d[:, None], (0, j))
            return drf_cache, kv_m, d, drafts

        prev = jnp.take_along_axis(tokens, (t - 1)[None].repeat(B)[:, None],
                                   axis=1)[:, 0]
        drafts0 = jnp.zeros((B, gamma + 1), jnp.int32)
        drf_cache, drf_kv, _, drafts_all = jax.lax.fori_loop(
            0, gamma + 1, draft_step, (drf_cache, kv_mask, prev, drafts0))
        drafts = drafts_all[:, :gamma]

        # --- target verifies [prev, drafts...] in ONE forward; exact greedy
        # acceptance + eos/kv_mask bookkeeping shared with prompt-lookup.
        # kv note: the chunk wrote slots [base, base+G); only the first a+1
        # (prev + accepted drafts) become valid — the bonus token's kv is
        # NOT written yet (it is next iteration's `prev`).
        tokens, tgt_cache, kv_mask, new_finished, a = _verify_accept(
            target_cfg, target_params, tokens=tokens, tgt_cache=tgt_cache,
            kv_mask=kv_mask, finished=finished, prev=prev, drafts=drafts,
            t=t, base=base, pos_base=pos_base, gamma=gamma, eos=eos,
            pad=pad, dtype=dtype, attn_impl=attn_impl)

        return (t + 1 + a, tokens, tgt_cache, drf_cache, kv_mask,
                new_finished, n_fwd + 1)

    state = (jnp.asarray(1, jnp.int32), tokens, tgt_cache, drf_cache,
             kv_mask0, finished0, jnp.asarray(1, jnp.int32))
    (t, tokens, _, _, _, _, n_fwd) = jax.lax.while_loop(cond, body, state)
    return tokens[:, :NEW], n_fwd


def self_speculative_generate(
    cfg: DecoderConfig,
    params,
    *,
    inputs_embeds,
    attention_mask,
    gen_cfg: GenerationConfig,
    draft_layers: int,
    gamma: int = 4,
    attn_impl: str = "xla",
    cache_dtype=None,
):
    """Self-speculative (early-exit) decoding: the draft is the target's own
    first `draft_layers` layers + its final norm/lm_head — no second model,
    no extra weights resident (LayerSkip/draft-and-verify family; beyond the
    reference, which decodes one token per forward via HF GenerationMixin).

    Same exactness guarantee as speculative_generate: greedy output is
    token-identical to plain greedy generate() for ANY draft_layers; the
    draft quality only changes how many target forwards it takes.  A draft
    step costs ~draft_layers/num_layers of a full decode step (decode is
    weight-read-bound), so the break-even acceptance rate is low.

    Returns (tokens (B, max_new), n_target_forwards)."""
    if not 0 < draft_layers < cfg.num_layers:
        raise ValueError("draft_layers must be in (0, num_layers)")
    return speculative_generate(
        cfg, params, cfg, params,
        inputs_embeds=inputs_embeds, draft_inputs_embeds=inputs_embeds,
        attention_mask=attention_mask, gen_cfg=gen_cfg, gamma=gamma,
        attn_impl=attn_impl, cache_dtype=cache_dtype,
        draft_num_layers=draft_layers)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "gen_cfg", "gamma", "ngram", "attn_impl",
                     "cache_dtype", "kv_bits"),
)
def prompt_lookup_generate(
    cfg: DecoderConfig,
    params,
    *,
    inputs_embeds,          # (B, P, H) left-padded prompt embeddings
    attention_mask,         # (B, P)
    gen_cfg: GenerationConfig,
    prompt_ids=None,        # optional (B, Pp) int32 token ids to match in
    prompt_ids_mask=None,   # (B, Pp) 0/1 validity for prompt_ids
    gamma: int = 4,
    ngram: int = 2,
    attn_impl: str = "xla",
    cache_dtype=None,
    kv_bits=None,
):
    """Prompt-lookup (n-gram) speculative decoding — the reference's HF
    `generate(prompt_lookup_num_tokens=...)` capability
    (transformers PromptLookupCandidateGenerator; exposed to every
    reference pipeline through GenerationMixin, e.g.
    /root/reference/scripts/generate_instruct.py:72-87): drafts come from
    matching the last `ngram` accepted tokens against the token history
    and copying the `gamma` tokens that followed the MOST RECENT previous
    occurrence.  Training-free, no draft model, no extra weights — the
    only cost per iteration is the same G=gamma+1-token verify forward the
    other speculative variants pay, which at the HBM-bound decode regime
    costs about one plain step.

    The history is the generated tokens so far plus (optionally)
    `prompt_ids` — in the composed protein→text models most of the prompt
    is protein EMBEDDINGS with no token ids, so unlike HF the text ids are
    passed separately and the protein span simply never matches.  Rows
    whose history has no match draft `pad` and advance by the bonus token
    (exactly plain greedy).  Greedy-exact for ANY history by the shared
    acceptance rule (_verify_accept).

    Returns (tokens (B, max_new), n_target_forwards)."""
    B, P, _ = inputs_embeds.shape
    NEW = gen_cfg.max_new_tokens
    G = gamma + 1
    T = P + NEW + G
    fused_ok = False
    if kv_bits is not None:
        # int8 KV: size the cache for the fused chunk-verify kernel
        # (chunk starts <= T - 64, 32-sublane tile groups)
        T = -(-(P + NEW + max(G, 64)) // 32) * 32
        # static proof of the kernel's slot <= T - 64 precondition: every
        # chunk starts at base = P + t - 1 <= P + NEW - 1
        fused_ok = T - 64 >= P + NEW
    eos, pad = gen_cfg.eos_token_id, gen_cfg.pad_token_id
    dtype = cache_dtype or inputs_embeds.dtype

    positions = jnp.clip(
        jnp.cumsum(attention_mask, axis=1) - 1, 0, None).astype(jnp.int32)
    last_pos = positions[:, -1]

    cache = init_kv_cache(cfg, B, T, dtype, kv_bits=kv_bits)
    bias = _prefill_bias(attention_mask, T)
    h, tgt_cache = decoder_forward(
        cfg, params, inputs_embeds=inputs_embeds.astype(dtype), bias=bias,
        positions=positions, kv_cache=cache, cache_index=0,
        attn_impl=attn_impl)
    tok0 = jnp.argmax(
        decoder_logits(cfg, params, h[:, -1:])[:, 0], axis=-1
    ).astype(jnp.int32)
    tokens = jnp.full((B, NEW + G), pad, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    finished0 = tok0 == eos
    kv_mask0 = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.zeros((B, T - P), jnp.int32)], axis=1)           # (B, T)

    # -- static history prefix: invalid positions get a -1 sentinel, which
    # can never equal a real token id, so pads/protein spans never match
    if prompt_ids is None:
        Pp = 0
        hist_prompt = jnp.zeros((B, 0), jnp.int32)
    else:
        Pp = prompt_ids.shape[1]
        valid = (jnp.ones_like(prompt_ids) if prompt_ids_mask is None
                 else prompt_ids_mask.astype(jnp.int32))
        hist_prompt = jnp.where(valid > 0, prompt_ids.astype(jnp.int32), -1)
    HL = Pp + NEW + G             # history width (prompt ids + generated)

    def cond(state):
        (t, _, _, _, finished, _) = state
        return jnp.logical_and(t < NEW, ~jnp.all(finished))

    def body(state):
        (t, tokens, tgt_cache, kv_mask, finished, n_fwd) = state
        base = P + t - 1
        pos_base = last_pos + t
        prev = jnp.take_along_axis(
            tokens, (t - 1)[None].repeat(B)[:, None], axis=1)[:, 0]

        # --- n-gram lookup draft (pure array ops, no model, no cache).
        # Drafted ONE token at a time, each appended to the history before
        # the next match: a single gamma-token gather from the most recent
        # match would run past the known tokens whenever the repetition
        # period is < gamma (the continuation of the most recent
        # occurrence IS the unknown future) — chasing the draft's own
        # appended tokens handles any period.  gamma × (B × HL) integer
        # compares: negligible next to the verify forward.
        gen_valid = jnp.arange(NEW + G)[None, :] < t
        histx = jnp.concatenate(
            [hist_prompt, jnp.where(gen_valid, tokens, -1)], axis=1)
        # the shared per-row chase (serving.ngram_drafts) with a uniform
        # history length Pp + t; -1 prompt-pad sentinels inside the valid
        # span never match, exactly as in the previous inline loop
        from .serving import ngram_drafts

        drafts = ngram_drafts(
            histx, jnp.broadcast_to(Pp + t, (B,)).astype(jnp.int32),
            gamma=gamma, ngram=ngram, fallback=pad)

        tokens, tgt_cache, kv_mask, finished, a = _verify_accept(
            cfg, params, tokens=tokens, tgt_cache=tgt_cache,
            kv_mask=kv_mask, finished=finished, prev=prev, drafts=drafts,
            t=t, base=base, pos_base=pos_base, gamma=gamma, eos=eos,
            pad=pad, dtype=dtype, attn_impl=attn_impl, fused_ok=fused_ok)
        return (t + 1 + a, tokens, tgt_cache, kv_mask, finished, n_fwd + 1)

    state = (jnp.asarray(1, jnp.int32), tokens, tgt_cache, kv_mask0,
             finished0, jnp.asarray(1, jnp.int32))
    (t, tokens, _, _, _, n_fwd) = jax.lax.while_loop(cond, body, state)
    return tokens[:, :NEW], n_fwd
