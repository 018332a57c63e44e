"""Continuous batching — slot-based serving loop (beyond reference).

The reference serves with static batches (generate_instruct.py loops a
DataLoader; every sequence in a batch decodes until ALL finish), so short
answers wait for the longest one.  This engine keeps a fixed pool of
`max_slots` cache slots; each decode round advances EVERY active slot by
`sync_every` tokens at its own length (per-row cache indices,
models/decoder.py decoder_decode_step), finished slots are freed
immediately and refilled from the queue by prefilling straight into the
freed slot's cache region.

TPU-static and sync-lean by construction:
  * all jitted pieces see fixed shapes — (max_slots,)-wide state,
    `prompt_pad`-wide prefill — and the serving state (KV cache + per-slot
    metadata) is DONATED through every call, so slot writes stay in place
    across jit boundaries;
  * prefill + install + first-token sampling for ALL pending requests is
    ONE dispatch per (row-count, prompt-length) bucket, sized to the number
    of requests actually being installed (a single-slot refill prefills one
    row, not max_slots rows); each decode round is ONE dispatch returning
    one packed (3, sync_every, B) array; slot occupancy is mirrored on the
    host so no extra device reads are needed.  Dispatch/transfer latency (large under
    remote-tunnel execution) is paid once per round, amortized
    sync_every-fold.

Greedy output is token-identical to per-request generate() for ANY
max_slots / sync_every (tests/test_serving.py).

Typical use:

    eng = ContinuousBatcher(cfg, params, max_slots=16, max_len=512)
    for rid, emb, n in requests:
        eng.submit(rid, emb, max_new_tokens=n)
    for request_id, tokens in eng.run():
        ...  # emitted as each request finishes, NOT in batch order
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import (
    DecoderConfig, contiguous_lengths, decoder_decode_step, decoder_forward,
    decoder_logits, kv_cache_layout,
)
from .generate import _bias_from_kv_mask
from .kvcache import init_kv_cache


@dataclasses.dataclass
class _Request:
    request_id: object
    embeds: object              # (W, H) prompt embeddings, host or device;
                                # real tokens are the LAST prompt_len rows
    max_new_tokens: int
    prompt_len: int = 0
    use_prefix: bool = False    # attend the engine's shared-prefix KV
                                # (embeds then hold only the SUFFIX)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "prefix_cols", "kv_bits"))
def _prefix_prefill(cfg: DecoderConfig, params, emb, mask, *,
                    prefix_cols: int, kv_bits):
    """ONE-TIME prefill of the shared prompt prefix (left-padded to
    prefix_cols, a 128-multiple): returns the (L, 1, ...) KV slabs that
    every install seeds into freed slots by device copy.  Ordinary causal
    self-attention — identical math to the first prefix_len rows of a
    full-prompt prefill, so prefix-shared streams stay greedy-exact."""
    emb = jnp.where(mask[:, :, None] > 0, emb, 0)
    cache = init_kv_cache(cfg, 1, prefix_cols, emb.dtype, kv_bits=kv_bits)
    positions = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, None
                         ).astype(jnp.int32)
    idx = jnp.arange(prefix_cols)
    causal = idx[None, :] <= idx[:, None]
    ok = jnp.logical_and(causal[None, None], mask[:, None, None, :] > 0)
    bias = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)
    _, cache = decoder_forward(
        cfg, params, inputs_embeds=emb, bias=bias, positions=positions,
        kv_cache=cache, cache_index=0, attn_impl="flash",
        attn_lengths=contiguous_lengths(mask))
    return cache


@functools.partial(jax.jit, donate_argnums=(1,),
                   static_argnames=("cfg", "prompt_pad", "eos_token_id",
                                    "gen_cfg", "prefix_cols", "prefix_len",
                                    "dedup"))
def _prefill_install_pool(cfg: DecoderConfig, state, params, emb, mask,
                          row_for_slot, install, plens, budgets, rng,
                          pkv=None, *, prompt_pad: int, eos_token_id: int,
                          gen_cfg=None, prefix_cols: int = 0,
                          prefix_len: int = 0, dedup: bool = False):
    """One dispatch installs ANY number of pending requests: an
    (R, prompt_pad)-wide prefill where R is the (bucketed) number of
    requests being installed — NOT the pool width; a single-slot refill
    must not pay a max_slots-row prefill (at the 8B flagship that is
    ~8x the FLOPs of the one row it needs) — then one masked update of
    the pool's first prompt_pad cache columns + metadata.
    `row_for_slot` (max_slots,) maps each slot to its prefill row (any
    valid index for slots not in `install`); rows not being installed
    keep their current contents exactly.  Returns (state,
    tok0 (max_slots,) in SLOT order).

    PREFIX-SHARED KV (prefix_cols > 0): `pkv` holds the precomputed KV of
    a prompt prefix SHARED by every request (the chat system+template
    header — ContinuousBatcher computes it ONCE per engine).  It is
    seeded into cache columns [0, prefix_cols) by a device copy —
    prefill then runs only over the PRIVATE suffix (cache_index =
    prefix_cols), attending [shared ‖ suffix].  prefix_len is the real
    prefix token count; the prefix is left-padded to prefix_cols (a
    lane-tile multiple) so its valid columns are [prefix_cols -
    prefix_len, prefix_cols).  Copying beats recomputing: the prefix KV
    copy is ~bytes(prefix_cols) per row while the skipped prefill is a
    full forward over prefix_len tokens per request.

    DEDUP mode (dedup=True): the pool does NOT hold the prefix at all —
    the decode/verify steps read `pkv` directly as a batch-broadcast
    second cache operand (HBM holds ONE prefix copy instead of
    max_slots).  The prefill still seeds the prefix into its own
    transient R-row cache (identical forward math), but only the SUFFIX
    columns [prefix_cols, W) are copied into pool columns
    [0, prompt_pad), and state["use_pfx"] records which slots attend
    the shared prefix at decode time."""
    B = state["pos"].shape[0]
    R = emb.shape[0]
    # device-submitted prompts keep whatever their padding rows held (the
    # engine re-pads on device without touching the data) — zero them here
    # so garbage/NaN padding can never leak through the XLA einsum
    # attention path (0 * NaN = NaN even at softmax weight 0)
    emb = jnp.where(mask[:, :, None] > 0, emb, 0)
    kv_bits = 8 if "k_scale" in state else None   # dict structure is static
    W = prefix_cols + prompt_pad          # prefill cache width
    cache = init_kv_cache(cfg, R, W, emb.dtype, kv_bits=kv_bits)
    positions = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, None
                         ).astype(jnp.int32) + prefix_len
    idx = jnp.arange(prompt_pad)
    causal = idx[None, :] <= idx[:, None]
    ok = jnp.logical_and(causal[None, None], mask[:, None, None, :] > 0)
    if prefix_cols:
        # seed the shared prefix KV into every prefill row (broadcast copy)
        if kv_cache_layout(cfg) == "bktd":    # pkv (L, 1, K, prefix_cols, D)
            cache["k"] = cache["k"].at[:, :, :, :prefix_cols, :].set(
                jnp.broadcast_to(pkv["k"].astype(cache["k"].dtype),
                                 (cache["k"].shape[0], R)
                                 + pkv["k"].shape[2:]))
            cache["v"] = cache["v"].at[:, :, :, :prefix_cols, :].set(
                jnp.broadcast_to(pkv["v"].astype(cache["v"].dtype),
                                 (cache["v"].shape[0], R)
                                 + pkv["v"].shape[2:]))
            if kv_bits is not None:           # scales (L, 1, K, prefix_cols)
                for s in ("k_scale", "v_scale"):
                    cache[s] = cache[s].at[:, :, :, :prefix_cols].set(
                        jnp.broadcast_to(pkv[s], (cache[s].shape[0], R)
                                         + pkv[s].shape[2:]))
        else:                                 # pkv (L, prefix_cols, 1, K, D)
            cache["k"] = cache["k"].at[:, :prefix_cols].set(
                jnp.broadcast_to(pkv["k"].astype(cache["k"].dtype),
                                 pkv["k"].shape[:2] + (R,)
                                 + pkv["k"].shape[3:]))
            cache["v"] = cache["v"].at[:, :prefix_cols].set(
                jnp.broadcast_to(pkv["v"].astype(cache["v"].dtype),
                                 pkv["v"].shape[:2] + (R,)
                                 + pkv["v"].shape[3:]))
        # suffix queries attend the prefix's VALID columns plus the causal
        # window; the left-pad columns [0, prefix_cols - prefix_len) stay
        # masked forever
        pvalid = jnp.arange(prefix_cols) >= (prefix_cols - prefix_len)
        okp = jnp.broadcast_to(pvalid[None, None, None, :],
                               (R, 1, prompt_pad, prefix_cols))
        bias = jnp.where(jnp.concatenate([okp, ok], axis=-1),
                         0.0, jnp.finfo(jnp.float32).min)
        # bias-carrying attention (flash when tileable, chunked XLA
        # otherwise): the masked-flash fast path asserts self-attention
        # over [0, S) and cannot see the seeded prefix columns
        h, cache = decoder_forward(
            cfg, params, inputs_embeds=emb, bias=bias, positions=positions,
            kv_cache=cache, cache_index=prefix_cols, attn_impl="flash")
    else:
        bias = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)
        # forward-only prefill: masked flash where eligible — at the real
        # ~1.6k-token chat prompts the XLA einsum path materializes the
        # (B, H, P, P) fp32 logits (~3 GB at 8 slots x 1664 on the 8B),
        # which both costs bandwidth and pressures XLA compilation at
        # pool scale
        h, cache = decoder_forward(
            cfg, params, inputs_embeds=emb, bias=bias, positions=positions,
            kv_cache=cache, cache_index=0, attn_impl="flash",
            attn_lengths=contiguous_lengths(mask))
    logits = decoder_logits(cfg, params, h[:, -1:])[:, 0]
    if gen_cfg is not None and gen_cfg.do_sample:
        from .generate import filter_logits

        tok0 = jax.random.categorical(
            rng, filter_logits(logits, gen_cfg), axis=-1).astype(jnp.int32)
    else:
        tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # (R,)
    tok0 = tok0[row_for_slot]                                  # (B,)

    inst = install                                             # (B,) bool
    # dedup: only the suffix columns [off, W) of the transient prefill
    # cache enter the pool (at columns [0, Wp)); the prefix stays in `pkv`
    off = prefix_cols if dedup else 0
    Wp = W - off
    if kv_cache_layout(cfg) == "bktd":     # pool slab (L, B, K, P, D)
        sel = inst[None, :, None, None, None]
        ck = jnp.take(cache["k"], row_for_slot, axis=1)[:, :, :, off:, :]
        cv = jnp.take(cache["v"], row_for_slot, axis=1)[:, :, :, off:, :]
        state["k"] = state["k"].at[:, :, :, :Wp, :].set(
            jnp.where(sel, ck.astype(state["k"].dtype),
                      state["k"][:, :, :, :Wp, :]))
        state["v"] = state["v"].at[:, :, :, :Wp, :].set(
            jnp.where(sel, cv.astype(state["v"].dtype),
                      state["v"][:, :, :, :Wp, :]))
        if kv_bits is not None:            # scale slabs (L, B, K, P)
            sel3 = inst[None, :, None, None]
            for s in ("k_scale", "v_scale"):
                state[s] = state[s].at[:, :, :, :Wp].set(
                    jnp.where(sel3,
                              jnp.take(cache[s], row_for_slot,
                                       axis=1)[:, :, :, off:],
                              state[s][:, :, :, :Wp]))
    else:                                  # (L, P, B, K, D) seq-leading
        sel = inst[None, None, :, None, None]
        ck = jnp.take(cache["k"], row_for_slot, axis=2)[:, off:]
        cv = jnp.take(cache["v"], row_for_slot, axis=2)[:, off:]
        state["k"] = state["k"].at[:, :Wp].set(
            jnp.where(sel, ck.astype(state["k"].dtype),
                      state["k"][:, :Wp]))
        state["v"] = state["v"].at[:, :Wp].set(
            jnp.where(sel, cv.astype(state["v"].dtype),
                      state["v"][:, :Wp]))
    T = state["kv_mask"].shape[1]
    pads = (prompt_pad - plens)[:, None]   # per-row left padding
    colsT = jnp.arange(T)[None, :]
    # valid pool columns: the left-padded suffix window; plus (replicated
    # mode only) the prefix's real tokens at [prefix_cols - prefix_len,
    # prefix_cols) — in dedup mode the prefix never occupies the pool and
    # its validity is the decode-time prefix bias gated by use_pfx
    base = 0 if dedup else prefix_cols
    row_mask = jnp.logical_and(colsT < base + prompt_pad,
                               colsT >= base + pads).astype(jnp.int32)
    if prefix_cols and not dedup:
        row_mask = jnp.maximum(
            row_mask,
            jnp.logical_and(colsT >= prefix_cols - prefix_len,
                            colsT < prefix_cols).astype(jnp.int32))
    finished0 = jnp.logical_or(tok0 == eos_token_id, budgets <= 1)
    i2 = inst[:, None]
    state["kv_mask"] = jnp.where(i2, row_mask, state["kv_mask"])
    state["pos"] = jnp.where(inst, prefix_len + plens - 1, state["pos"])
    state["next_slot"] = jnp.where(inst, base + prompt_pad,
                                   state["next_slot"])
    if "use_pfx" in state:         # dedup: which slots see the shared prefix
        state["use_pfx"] = jnp.where(
            inst, 1 if (dedup and prefix_cols) else 0, state["use_pfx"])
    state["active"] = jnp.where(inst, ~finished0, state["active"])
    state["last_tok"] = jnp.where(inst, tok0, state["last_tok"])
    state["budget"] = jnp.where(inst, budgets - 1, state["budget"])
    if "hist" in state:            # speculative history: reset to [tok0]
        HW = state["hist"].shape[1]
        hrow = jnp.where(jnp.arange(HW)[None, :] == 0, tok0[:, None], -1)
        state["hist"] = jnp.where(i2, hrow, state["hist"])
        state["hist_len"] = jnp.where(inst, 1, state["hist_len"])
    if "last_hidden" in state:     # medusa draft source: frontier hidden
        hl = h[:, -1, :][row_for_slot].astype(state["last_hidden"].dtype)
        state["last_hidden"] = jnp.where(i2, hl, state["last_hidden"])
    return state, tok0


def _prefix_row_bias(state, pkv, prefix_len: int, layout: str):
    """(B, 1, 1, Pc) fp32 additive bias over the shared-prefix columns:
    valid = the prefix's real tokens AND the row opted into the prefix
    (use_pfx — full-prompt requests sharing a dedup pool must not see
    it).  Constant within a dispatch (use_pfx only changes at install)."""
    Pc = pkv["k"].shape[3] if layout == "bktd" else pkv["k"].shape[1]
    pvalid = jnp.arange(Pc) >= Pc - prefix_len
    ok = jnp.logical_and(state["use_pfx"][:, None] > 0, pvalid[None, :])
    return jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min
                     )[:, None, None, :]


@functools.partial(jax.jit, donate_argnums=(1,),
                   static_argnames=("cfg", "eos_token_id", "chunk",
                                    "gen_cfg", "prefix_len"))
def _decode_all(cfg: DecoderConfig, state, params, rng, pkv=None, *,
                eos_token_id: int, chunk: int = 1, gen_cfg=None,
                prefix_len: int = 0):
    """`chunk` tokens for every active slot, device-side (one host sync per
    chunk — slots that finish mid-chunk stop advancing on device, so the
    per-request token streams are identical for any chunk size; refills
    just wait until the chunk boundary).  gen_cfg enables HF-warper
    sampling (temperature/top-k/top-p, infer/generate.filter_logits) with
    one fresh key per micro-step; None = greedy argmax.  Returns (state,
    packed (3, chunk, B) int32 = [tok, finished, advanced])."""
    B = state["pos"].shape[0]
    bidx = jnp.arange(B)

    cdt = state["k"].dtype
    if cdt == jnp.int8:                    # quantized pool: compute in bf16
        cdt = jnp.bfloat16
    pbias = (None if pkv is None else
             _prefix_row_bias(state, pkv, prefix_len, kv_cache_layout(cfg)))

    def step(carry, _):
        state, rng = carry
        emb = params["embed_tokens"][state["last_tok"]][:, None, :].astype(
            cdt)
        bias = _bias_from_kv_mask(state["kv_mask"], 1)
        pos = (state["pos"] + 1)[:, None]
        # decoder_decode_step writes k/v for EVERY row; inactive rows are
        # redirected to the scratch column (last cache column, kv_mask
        # permanently 0 there) so they never corrupt a live column — a
        # finished slot's cache stays intact until its refill
        scratch = state["kv_mask"].shape[1] - 1
        write_idx = jnp.where(state["active"], state["next_slot"], scratch)
        kv = {"k": state["k"], "v": state["v"]}
        if "k_scale" in state:             # int8 KV pool (kv_bits=8)
            kv["k_scale"] = state["k_scale"]
            kv["v_scale"] = state["v_scale"]
        h, cache = decoder_decode_step(
            cfg, params, token_embeds=emb, bias_old=bias, positions=pos,
            kv_cache=kv, cache_index=write_idx,
            prefix_kv=pkv, prefix_bias=pbias)
        for key_ in cache:
            state[key_] = cache[key_]
        state["kv_mask"] = state["kv_mask"].at[bidx, write_idx].set(
            jnp.where(state["active"], 1, state["kv_mask"][bidx, write_idx]))
        logits = decoder_logits(cfg, params, h)[:, 0]
        if gen_cfg is not None and gen_cfg.do_sample:
            from .generate import filter_logits

            rng, key = jax.random.split(rng)
            tok = jax.random.categorical(
                key, filter_logits(logits, gen_cfg), axis=-1
            ).astype(jnp.int32)
        else:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        state["budget"] = jnp.where(state["active"], state["budget"] - 1,
                                    state["budget"])
        finished = jnp.logical_and(
            state["active"],
            jnp.logical_or(tok == eos_token_id, state["budget"] <= 0))
        advanced = state["active"]
        state["pos"] = jnp.where(advanced, state["pos"] + 1, state["pos"])
        state["next_slot"] = jnp.where(
            advanced, jnp.minimum(state["next_slot"] + 1,
                                  state["kv_mask"].shape[1] - 1),
            state["next_slot"])
        state["last_tok"] = jnp.where(advanced, tok, state["last_tok"])
        if "hist" in state:
            # keep the n-gram draft source fresh even on single-token
            # dispatches, so the adaptive controller (spec_break_even) can
            # fall back to plain rounds and later re-probe drafting over a
            # complete history (stale history only hurts acceptance — the
            # verify forward keeps any draft safe — but complete history
            # keeps the re-probe honest)
            HW = state["hist"].shape[1]
            hpos = jnp.clip(state["hist_len"], 0, HW - 1)
            state["hist"] = state["hist"].at[bidx, hpos].set(
                jnp.where(advanced, tok, state["hist"][bidx, hpos]))
            state["hist_len"] = state["hist_len"] + advanced.astype(
                jnp.int32)
        if "last_hidden" in state:     # medusa frontier hidden stays fresh
            state["last_hidden"] = jnp.where(
                advanced[:, None],
                h[:, 0, :].astype(state["last_hidden"].dtype),
                state["last_hidden"])
        state["active"] = jnp.where(finished, False, state["active"])
        return (state, rng), (tok, finished.astype(jnp.int32),
                              advanced.astype(jnp.int32))

    (state, _), (toks, fin, adv) = jax.lax.scan(
        step, (state, rng), None, length=chunk)
    return state, jnp.stack([toks, fin, adv])


def ngram_drafts(hist, hist_len, *, gamma: int, ngram: int,
                 fallback: int = 0):
    """Per-row prompt-lookup drafts over each row's own token history —
    the ONE n-gram chase implementation, shared by the serving engine
    (_spec_rounds) and the lockstep speculative.prompt_lookup_generate.

    hist: (B, HW) int32 history rows: entries beyond hist_len[b] are
    ignored, and -1 sentinels INSIDE the valid span (e.g. prompt padding)
    are legal — they can never equal a real token id, so they simply
    never match.  hist_len: (B,) int32.  Each row drafts `gamma` tokens
    by chasing the latest `ngram`-gram match token-by-token (each draft
    is appended to the matching history, so repetition periods shorter
    than gamma copy correctly).  Rows with no match draft
    max(fallback, 0) (verification makes any draft safe).
    Returns (B, gamma) int32."""
    B, HW = hist.shape
    W = HW - ngram + 1
    bidx = jnp.arange(B)
    histx = jnp.where(jnp.arange(HW)[None, :] < hist_len[:, None], hist, -1)

    def draft_one(j, carry):
        histx, drafts = carry
        end = hist_len + j                              # (B,)
        gram_pos = jnp.clip(
            end[:, None] - ngram + jnp.arange(ngram)[None, :],
            0, HW - 1)
        prevgram = jnp.take_along_axis(histx, gram_pos, axis=1)
        mall = jnp.ones((B, W), bool)
        for k in range(ngram):
            mall = jnp.logical_and(
                mall, histx[:, k:W + k] == prevgram[:, k][:, None])
        svalid = jnp.arange(W)[None, :] < (end - ngram)[:, None]
        ok = jnp.logical_and(mall, svalid)
        score = jnp.where(ok, jnp.arange(W)[None, :], -1)
        s_best = jnp.max(score, axis=1)                 # (B,)
        nxt = jnp.take_along_axis(
            histx, jnp.clip(s_best + ngram, 0, HW - 1)[:, None],
            axis=1)[:, 0]
        nxt = jnp.maximum(jnp.where(s_best >= 0, nxt, fallback), 0)
        drafts = jax.lax.dynamic_update_slice(
            drafts, nxt[:, None], (0, j))
        histx = histx.at[bidx, jnp.clip(end, 0, HW - 1)].set(nxt)
        return histx, drafts

    _, drafts = jax.lax.fori_loop(
        0, gamma, draft_one, (histx, jnp.zeros((B, gamma), jnp.int32)))
    return drafts


@functools.partial(jax.jit, donate_argnums=(1,),
                   static_argnames=("cfg", "eos_token_id", "gamma", "ngram",
                                    "rounds", "use_fused", "prefix_len"))
def _spec_rounds(cfg: DecoderConfig, state, params, pkv=None, *,
                 eos_token_id: int, gamma: int, ngram: int, rounds: int = 1,
                 use_fused: bool = False, medusa=None, prefix_len: int = 0):
    """`rounds` prompt-lookup speculative verify rounds with PER-ROW
    acceptance — the serving counterpart of infer/speculative.
    prompt_lookup_generate, without its batch-minimum lockstep: every slot
    drafts `gamma` tokens from its own generated history (n-gram match,
    chased token-by-token so periods < gamma copy correctly), one
    G=gamma+1-token chunk forward verifies ALL slots (per-row cache
    columns via decoder_forward's vector cache_index), and each row
    advances by ITS OWN accepted length (0..gamma drafts + 1 bonus) —
    per-row cache indices make ragged acceptance free where the lockstep
    generate() must advance by the batch minimum.

    Rejected-draft kv entries land beyond the accepted point with kv_mask
    0 and are overwritten as next_slot advances; inactive rows write into
    the G-wide scratch region at the cache tail.  Greedy only.  Returns
    (state, packed (3, rounds, G, B) int32 = [tokens, emit-flags,
    finished-flags]): row b of round r emits tokens[r, :counts, b] where
    counts = emit[r, :, b].sum() (contiguous prefix)."""
    B = state["pos"].shape[0]
    G = gamma + 1
    T = state["kv_mask"].shape[1]
    HW = state["hist"].shape[1] if "hist" in state else 0
    bidx = jnp.arange(B)
    cdt = state["k"].dtype
    if cdt == jnp.int8:
        cdt = jnp.bfloat16
    pbias = (None if pkv is None else
             _prefix_row_bias(state, pkv, prefix_len, kv_cache_layout(cfg)))

    def one_round(state, _):
        if medusa is not None:
            # --- learned draft heads over the frontier hidden state -----
            from ..models.medusa import medusa_drafts

            drafts = medusa_drafts(cfg, params, medusa,
                                   state["last_hidden"].astype(cdt))
        else:
            # --- per-row n-gram drafts from each slot's own history -----
            drafts = ngram_drafts(state["hist"], state["hist_len"],
                                  gamma=gamma, ngram=ngram)

        # --- one G-token verify forward over the pool cache --------------
        chunk = jnp.concatenate(
            [state["last_tok"][:, None], drafts], axis=1)   # (B, G)
        emb = params["embed_tokens"][chunk].astype(cdt)
        scratch = T - (64 if use_fused else G)              # dead tail
        start = jnp.where(state["active"], state["next_slot"], scratch)
        pos = (state["pos"] + 1)[:, None] + jnp.arange(G)[None, :]
        kv = {"k": state["k"], "v": state["v"]}
        if "k_scale" in state:
            kv["k_scale"] = state["k_scale"]
            kv["v_scale"] = state["v_scale"]
        if use_fused:
            # fused Pallas chunk kernel: int8 tiles stream once, chunk
            # slots written in place (models/decoder.decoder_verify_chunk);
            # under dedup the shared prefix rides as the batch-broadcast
            # read-only operand
            from ..models.decoder import decoder_verify_chunk

            h, kv = decoder_verify_chunk(
                cfg, params, token_embeds=emb,
                kv_mask01=state["kv_mask"], positions=pos,
                kv_cache=kv, cache_index=start,
                prefix_kv=pkv, prefix_bias=pbias)
        else:
            cols = jnp.arange(T)[None, None, None, :]
            rows = jnp.arange(G)[None, None, :, None]
            st4 = start[:, None, None, None]
            ok = jnp.logical_or(
                jnp.broadcast_to(
                    state["kv_mask"][:, None, None, :] > 0, (B, 1, G, T)),
                jnp.logical_and(cols >= st4, cols <= st4 + rows))
            bias = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)
            h, kv = decoder_forward(
                cfg, params, inputs_embeds=emb, bias=bias, positions=pos,
                kv_cache=kv, cache_index=start, attn_impl="xla",
                prefix_kv=pkv, prefix_bias=pbias)
        for key_ in kv:
            state[key_] = kv[key_]
        tgt = jnp.argmax(
            decoder_logits(cfg, params, h), axis=-1).astype(jnp.int32)

        # --- per-row acceptance + budget/eos clamps ----------------------
        match = drafts == tgt[:, :gamma]                    # (B, gamma)
        a = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
        bonus = jnp.take_along_axis(tgt, a[:, None], axis=1)[:, 0]
        out = jnp.concatenate([drafts, tgt[:, -1:]], axis=1)
        out = jnp.where(jnp.arange(G)[None, :] == a[:, None],
                        bonus[:, None], out)                # (B, G)
        L0 = jnp.minimum(a + 1, state["budget"])            # budget clamp
        iseos = jnp.logical_and(out == eos_token_id,
                                jnp.arange(G)[None, :] < L0[:, None])
        has_eos = iseos.any(axis=1)
        eos_pos = jnp.argmax(iseos, axis=1)
        L = jnp.where(has_eos, eos_pos + 1, L0)
        L = jnp.where(state["active"], L, 0)                # (B,)
        fin = jnp.logical_and(
            state["active"],
            jnp.logical_or(has_eos, state["budget"] - L <= 0))

        newly = jnp.logical_and(
            jnp.arange(T)[None, :] >= start[:, None],
            jnp.arange(T)[None, :] < (start + L)[:, None])
        state["kv_mask"] = jnp.where(
            jnp.logical_and(newly, state["active"][:, None]),
            1, state["kv_mask"])
        emit = jnp.arange(G)[None, :] < L[:, None]          # (B, G)
        if "hist" in state:
            hpos = jnp.clip(
                state["hist_len"][:, None] + jnp.arange(G)[None, :],
                0, HW - 1)
            hvals = jnp.take_along_axis(state["hist"], hpos, axis=1)
            state["hist"] = state["hist"].at[bidx[:, None], hpos].set(
                jnp.where(emit, out, hvals))
            state["hist_len"] = state["hist_len"] + L
        if "last_hidden" in state:
            # new frontier hidden = the chunk hidden that EMITTED the last
            # accepted token (position L-1 generated out[L-1])
            hL = jnp.take_along_axis(
                h, jnp.clip(L - 1, 0, G - 1)[:, None, None], axis=1)[:, 0]
            state["last_hidden"] = jnp.where(
                (L > 0)[:, None], hL.astype(state["last_hidden"].dtype),
                state["last_hidden"])
        state["budget"] = state["budget"] - L
        state["pos"] = state["pos"] + L
        state["next_slot"] = jnp.minimum(state["next_slot"] + L, scratch)
        last = jnp.take_along_axis(
            out, jnp.clip(L - 1, 0, G - 1)[:, None], axis=1)[:, 0]
        state["last_tok"] = jnp.where(L > 0, last, state["last_tok"])
        state["active"] = jnp.where(fin, False, state["active"])
        return state, (out.T, emit.T.astype(jnp.int32),
                       jnp.broadcast_to(fin[None, :], (G, B)
                                        ).astype(jnp.int32))

    state, (toks, emit, fin) = jax.lax.scan(
        one_round, state, None, length=rounds)
    return state, jnp.stack([toks, emit, fin])


class ContinuousBatcher:
    """Greedy continuous-batching engine over `decoder_decode_step`.

    cfg/params: the decoder core + its params (quantized or bf16).
    max_slots: concurrent sequences (the static batch width).
    max_len: cache width per slot (largest prompt_pad + longest answer).
    prompt_pad: static prefill width(s).  An int gives one width; a tuple
        gives LENGTH BUCKETS — each request prefills at the smallest bucket
        >= its prompt length (one jit compilation per bucket), so a ragged
        workload (the real chat prompt is ~1.6k tokens while short ones are
        a few hundred) doesn't pay the longest width on every prefill.
    sync_every: decode tokens per host round-trip (latency amortization).
    """

    def __init__(self, cfg: DecoderConfig, params, *, max_slots: int,
                 max_len: int, prompt_pad=64,
                 eos_token_id: int = 128009, cache_dtype=jnp.bfloat16,
                 sync_every: int = 1, gen_cfg=None, rng=None, kv_bits=None,
                 prompt_lookup_tokens: int = 0,
                 prompt_lookup_ngram: int = 2,
                 medusa_params=None,
                 spec_break_even: float = 0.0,
                 spec_probe_every: int = 8,
                 shared_prefix_embeds=None,
                 prefix_dedup: bool = False,
                 max_prefill_rows: int = 16):
        buckets = ((prompt_pad,) if isinstance(prompt_pad, int)
                   else tuple(sorted(prompt_pad)))
        if not buckets or buckets[-1] >= max_len:
            raise ValueError("prompt_pad must leave room for new tokens")
        self.cfg = cfg
        self.params = params
        self.max_slots = max_slots
        self.max_len = max_len
        self.prompt_buckets = buckets
        self.prompt_pad = buckets[-1]
        self.eos_token_id = eos_token_id
        self.dtype = cache_dtype
        self.sync_every = max(1, sync_every)
        # optional sampling: a GenerationConfig with do_sample=True applies
        # the HF warper pipeline per token (greedy stays the default and
        # the only mode with exact generate() token parity)
        self.gen_cfg = gen_cfg
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        # prompt-lookup speculative serving (_spec_rounds): per-slot n-gram
        # drafts verified in one chunk forward, PER-ROW acceptance
        self.spec_gamma = int(prompt_lookup_tokens)
        self.spec_ngram = int(prompt_lookup_ngram)
        # learned draft heads (models/medusa.py): gamma = number of heads;
        # mutually exclusive with the n-gram draft source
        self.medusa = medusa_params
        if medusa_params is not None:
            if self.spec_gamma:
                raise ValueError(
                    "medusa_params and prompt_lookup_tokens are mutually "
                    "exclusive draft sources")
            self.spec_gamma = int(medusa_params["w"].shape[0])
        if self.spec_gamma and gen_cfg is not None and gen_cfg.do_sample:
            raise ValueError("speculative serving is greedy-only")
        # adaptive speculative fallback: a verify round costs ~1.38x a
        # single-token step at the 8B flagship (scripts/bench_spec_floor.py:
        # 21.9 vs 15.85 ms — both weights-streaming bound), so drafting
        # only pays when the pool accepts > break_even tokens per round.
        # spec_break_even > 0 enables the controller: it tracks an EMA of
        # accepted tokens per (round, active slot); below the threshold
        # decode rounds fall back to plain single-token dispatches, with
        # one speculative PROBE dispatch every spec_probe_every plain
        # dispatches to detect when the stream turns draftable again.
        # 0.0 (default) = always speculate (the prior behavior).
        self.spec_break_even = float(spec_break_even)
        self.spec_probe_every = max(1, int(spec_probe_every))
        # cap on rows per prefill dispatch: the transient prefill cache is
        # R x (prefix_cols + prompt_pad) wide PER ROW — a 32-row install at
        # the 8B kv8 flagship is a ~3.8 GB transient that OOMs next to the
        # weights + pool.  Bigger pools refill in chunks of this many rows
        # (one dispatch each); <= 16 keeps the transient under ~2 GB at
        # flagship shapes with no measurable cost (prefill is
        # compute-bound, so chunking loses only dispatch overhead).
        self.max_prefill_rows = max(1, int(max_prefill_rows))
        self._accept_ema = None
        self._plain_since_probe = 0
        self.spec_fallbacks = 0        # plain dispatches taken while spec_gamma > 0
        # scratch columns: inactive rows' per-step kv writes are redirected
        # past the live region (the LAST column for single-token decode; a
        # G-wide tail region for speculative rounds, which also absorbs
        # rejected-draft writes) so a finished slot's real columns are
        # never overwritten; kv_mask there stays 0 forever, so it never
        # enters attention.  Width rounds up to a multiple of 16 so the
        # cache keeps Mosaic-tileable T and the fused attention+write
        # kernel's aliased 16-sublane bf16 tile groups stay aligned
        # (kernels/decode_attention.supports_decode_attention_write).
        # int8 KV pool (kv_bits=8): width rounds to the fused write
        # kernel's 32-sublane int8 tile groups instead
        # shared-prefix KV (TODO r3 #3 / the real chat workload): every
        # request shares the system+template prompt header, so its KV is
        # computed ONCE here and seeded into freed slots by device copy at
        # install — prefill then covers only the private suffix (submit
        # passes suffix embeddings + suffix prompt_len; buckets size to
        # SUFFIX lengths).  Columns [0, prefix_cols) of every slot hold the
        # prefix; the decode/verify paths are kv_mask-driven, so the masked
        # gap between the prefix and a left-padded suffix window is free.
        # prefix_dedup: the shared prefix KV lives ONCE in HBM and rides
        # into decode/verify as a batch-broadcast second cache operand —
        # the pool holds only private columns (max_slots × prefix_cols
        # cache bytes returned, ~0.5 GB at the 8B kv8 16×512 flagship =
        # room for more slots), and the Pallas kernels fetch the
        # constant-index prefix block once per layer instead of once per
        # pool row.  False replicates the prefix into every slot (the
        # round-3 behavior, kept for A/B).
        self.dedup = bool(prefix_dedup)
        if self.dedup and shared_prefix_embeds is None:
            raise ValueError("prefix_dedup=True requires "
                             "shared_prefix_embeds")
        self.prefix_kv = None
        self.prefix_cols = 0
        self.prefix_len = 0
        if shared_prefix_embeds is not None:
            pe = (shared_prefix_embeds
                  if isinstance(shared_prefix_embeds, jax.Array)
                  else jnp.asarray(np.asarray(shared_prefix_embeds)))
            Ps = int(pe.shape[0])
            if Ps <= 0:
                raise ValueError("shared_prefix_embeds must be (Ps>0, H)")
            Pc = -(-Ps // 128) * 128        # flash/lane-tile aligned width
            pemb = jnp.pad(pe.astype(cache_dtype),
                           ((Pc - Ps, 0), (0, 0)))[None]
            pmask = (jnp.arange(Pc) >= Pc - Ps).astype(jnp.int32)[None]
            self.prefix_kv = _prefix_prefill(
                cfg, params, pemb, pmask, prefix_cols=Pc, kv_bits=kv_bits)
            self.prefix_cols = Pc
            self.prefix_len = Ps
        mult = 32 if kv_bits is not None else 16
        slack = (self.spec_gamma + 1) if self.spec_gamma else 1
        if self.spec_gamma and kv_bits is not None:
            # the fused chunk-verify kernel needs chunk starts <= T - 64
            # (its aliased write covers two 32-sublane int8 tile groups)
            slack = max(slack, 64)
        pcols_pool = 0 if self.dedup else self.prefix_cols
        T_cache = -(-(pcols_pool + max_len + slack) // mult) * mult
        cache = init_kv_cache(cfg, max_slots, T_cache, cache_dtype,
                              kv_bits=kv_bits)
        self.state = {
            "k": cache["k"], "v": cache["v"],
            "kv_mask": jnp.zeros((max_slots, T_cache), jnp.int32),
            "pos": jnp.zeros((max_slots,), jnp.int32),
            "next_slot": jnp.zeros((max_slots,), jnp.int32),
            "active": jnp.zeros((max_slots,), bool),
            "last_tok": jnp.zeros((max_slots,), jnp.int32),
            "budget": jnp.zeros((max_slots,), jnp.int32),
        }
        if kv_bits is not None:
            self.state["k_scale"] = cache["k_scale"]
            self.state["v_scale"] = cache["v_scale"]
        if self.dedup:
            self.state["use_pfx"] = jnp.zeros((max_slots,), jnp.int32)
        if self.spec_gamma and self.medusa is None:
            # per-slot generated-token history (the n-gram match source;
            # prompts are fused EMBEDDINGS, so unlike HF's prompt lookup
            # there are no prompt ids to match — descriptions are
            # self-repetitive enough once a few tokens exist)
            HW = max_len - buckets[0] + self.spec_gamma + 2
            self.state["hist"] = jnp.full((max_slots, HW), -1, jnp.int32)
            self.state["hist_len"] = jnp.zeros((max_slots,), jnp.int32)
        if self.medusa is not None:
            # frontier hidden per slot — the heads' draft input
            self.state["last_hidden"] = jnp.zeros(
                (max_slots, cfg.hidden_size), cache_dtype)
        self._spec_fused = False
        if self.spec_gamma:
            from ..models.decoder import supports_verify_chunk_step

            self._spec_fused = (
                T_cache - 64 >= pcols_pool + max_len
                and supports_verify_chunk_step(
                    cfg, self.state, self.spec_gamma + 1,
                    prefix_cols=self.prefix_cols if self.dedup else 0,
                    params=self.params))
        self.queue: deque[_Request] = deque()
        self._slot_req: list[Optional[_Request]] = [None] * max_slots
        self._slot_toks: list[list[int]] = [[] for _ in range(max_slots)]
        self.steps = 0

    def _bucket_for(self, length: int) -> int:
        for b in self.prompt_buckets:
            if length <= b:
                return b
        raise ValueError(
            f"prompt length {length} > largest prompt_pad bucket "
            f"{self.prompt_buckets[-1]}")

    def submit(self, request_id, prompt_embeds, *, max_new_tokens: int = 64,
               prompt_len: Optional[int] = None,
               use_prefix: Optional[bool] = None):
        """prompt_embeds: (W, H) with the real tokens occupying the LAST
        `prompt_len` rows (left-padding convention; prompt_len defaults to
        W, i.e. an unpadded prompt).  A `jax.Array` stays ON DEVICE: the
        install path then assembles the prefill buffer with device ops —
        no host round-trip.  This is the production handoff: the encoder/
        adapter output is already device-resident, and pulling it to the
        host only to push it back costs seconds per batch under remote
        dispatch (a 14B-flagship batch of prompt embeddings is ~270 MB).

        With an engine-level shared prefix (shared_prefix_embeds), the
        real tokens are the SUFFIX that follows the shared prefix — the
        prefix KV is seeded by copy, never recomputed.  The caller owns
        the contract that each prefix-shared prompt actually starts with
        the shared prefix (cli/serve.py verifies token ids per request and
        routes mismatches through use_prefix=False, which prefills the
        full prompt self-contained — the two kinds can share the pool)."""
        emb = (prompt_embeds if isinstance(prompt_embeds, jax.Array)
               else np.asarray(prompt_embeds))
        plen = int(prompt_len) if prompt_len is not None else emb.shape[0]
        if not 0 < plen <= emb.shape[0]:
            raise ValueError(f"prompt_len {plen} outside (0, {emb.shape[0]}]")
        self._bucket_for(plen)              # validate length
        if max_new_tokens > self.max_len - self.prompt_pad:
            raise ValueError("max_new_tokens exceeds the slot cache width")
        upfx = bool(self.prefix_cols) if use_prefix is None else use_prefix
        if upfx and not self.prefix_cols:
            raise ValueError("use_prefix=True on an engine without "
                             "shared_prefix_embeds")
        self.queue.append(_Request(request_id, emb, max_new_tokens, plen,
                                   upfx))

    def _fill_free_slots(self) -> Iterator[tuple]:
        """Install queued requests into ALL free slots — one prefill
        dispatch PER LENGTH BUCKET present, sized to the installs."""
        installs = {}                       # slot -> request
        for slot in range(self.max_slots):
            if not self.queue:
                break
            if self._slot_req[slot] is None:
                installs[slot] = self.queue.popleft()
        if not installs:
            return
        by_bucket: dict = {}
        for slot, req in installs.items():
            by_bucket.setdefault(
                (self._bucket_for(req.prompt_len), req.use_prefix), {}
            )[slot] = req
        for (pad, upfx), group in sorted(by_bucket.items()):
            items = list(group.items())
            for i in range(0, len(items), self.max_prefill_rows):
                yield from self._install_group(
                    dict(items[i:i + self.max_prefill_rows]), pad, upfx)

    def _install_group(self, installs: dict, pad: int,
                       use_prefix: bool = False) -> Iterator[tuple]:
        B = self.max_slots
        reqs = list(installs.values())
        Hd = reqs[0].embeds.shape[1]
        # prefill width = number of requests being installed, bucketed to a
        # power of two (one compile per (rows, pad) pair actually seen) —
        # a single-slot refill prefills ONE row, not max_slots rows
        R = 1
        while R < len(installs):
            R *= 2
        R = min(R, B)
        mask = np.zeros((R, pad), np.int32)
        row_for_slot = np.zeros((B,), np.int32)
        inst = np.zeros((B,), bool)
        plens = np.ones((B,), np.int32)
        budgets = np.ones((B,), np.int32)
        device = all(isinstance(r.embeds, jax.Array) for r in reqs)
        rows = [] if device else None
        emb = None if device else np.zeros((R, pad, Hd), np.float32)
        for i, (slot, req) in enumerate(installs.items()):
            P = req.prompt_len
            if device:
                # device-resident prompt: re-pad to the bucket with device
                # ops (compiled once per (W, pad) pair) — no host transfer.
                # Padding rows may hold garbage; the jitted prefill zeroes
                # them against `mask` before the forward.
                r = req.embeds
                W = r.shape[0]
                if W > pad:                    # drop excess left padding
                    r = jax.lax.slice_in_dim(r, W - pad, W, axis=0)
                elif W < pad:                  # grow left padding
                    r = jnp.pad(r, ((pad - W, 0), (0, 0)))
                rows.append(r.astype(self.dtype))
            else:
                e = np.asarray(req.embeds)
                emb[i, pad - P:] = e[e.shape[0] - P:]   # left-pad
            mask[i, pad - P:] = 1
            row_for_slot[slot] = i
            inst[slot] = True
            plens[slot] = P
            budgets[slot] = req.max_new_tokens
        if device:
            emb_dev = jnp.stack(rows)
            if R > len(rows):
                emb_dev = jnp.pad(emb_dev,
                                  ((0, R - len(rows)), (0, 0), (0, 0)))
        else:
            emb_dev = jnp.asarray(emb, self.dtype)
        self._rng, key = jax.random.split(self._rng)
        self.state, tok0 = _prefill_install_pool(
            self.cfg, self.state, self.params,
            emb_dev, jnp.asarray(mask),
            jnp.asarray(row_for_slot),
            jnp.asarray(inst), jnp.asarray(plens), jnp.asarray(budgets),
            key, self.prefix_kv if use_prefix else None, prompt_pad=pad,
            eos_token_id=self.eos_token_id, gen_cfg=self.gen_cfg,
            prefix_cols=self.prefix_cols if use_prefix else 0,
            prefix_len=self.prefix_len if use_prefix else 0,
            dedup=self.dedup)
        tok0 = np.asarray(tok0)
        for slot, req in installs.items():
            t0 = int(tok0[slot])
            if t0 == self.eos_token_id or req.max_new_tokens <= 1:
                yield req.request_id, [t0]    # finished at the first token
            else:
                self._slot_req[slot] = req
                self._slot_toks[slot] = [t0]

    def _decode_round(self) -> Iterator[tuple]:
        """One decode round (sync_every tokens for every active slot),
        yielding (request_id, [tokens...]) for requests that finish."""
        if self.spec_gamma and self._spec_dispatch():
            yield from self._spec_decode_round()
            return
        if self.spec_gamma:
            self.spec_fallbacks += 1
        self._rng, key = jax.random.split(self._rng)
        self.state, packed = _decode_all(
            self.cfg, self.state, self.params, key,
            self.prefix_kv if self.dedup else None,
            eos_token_id=self.eos_token_id, chunk=self.sync_every,
            gen_cfg=self.gen_cfg,
            prefix_len=self.prefix_len if self.dedup else 0)
        self.steps += self.sync_every
        packed = np.asarray(packed)        # ONE transfer per round
        tok_h, fin_h, adv_h = packed[0], packed[1], packed[2]
        for c in range(tok_h.shape[0]):
            for slot in range(self.max_slots):
                if self._slot_req[slot] is None or not adv_h[c, slot]:
                    continue
                self._slot_toks[slot].append(int(tok_h[c, slot]))
                if fin_h[c, slot]:
                    req = self._slot_req[slot]
                    toks = self._slot_toks[slot]
                    self._slot_req[slot] = None
                    self._slot_toks[slot] = []
                    yield req.request_id, toks

    def _spec_dispatch(self) -> bool:
        """Adaptive controller: speculate this dispatch?  Always True with
        spec_break_even <= 0 (unconditional speculation).  Otherwise
        speculate while the acceptance EMA clears the break-even, fall
        back to plain single-token dispatches below it, and re-probe with
        one speculative dispatch every spec_probe_every plain ones."""
        if self.spec_break_even <= 0:
            return True
        if (self._accept_ema is None
                or self._accept_ema >= self.spec_break_even):
            self._plain_since_probe = 0
            return True
        self._plain_since_probe += 1
        if self._plain_since_probe >= self.spec_probe_every:
            self._plain_since_probe = 0
            return True                 # probe: refresh the EMA
        return False

    def _spec_decode_round(self) -> Iterator[tuple]:
        """Prompt-lookup speculative rounds (per-row acceptance): each
        dispatch runs ~sync_every/G verify rounds, each emitting 1..G
        tokens per active slot."""
        G = self.spec_gamma + 1
        rounds = max(1, self.sync_every // G)
        self.state, packed = _spec_rounds(
            self.cfg, self.state, self.params,
            self.prefix_kv if self.dedup else None,
            eos_token_id=self.eos_token_id, gamma=self.spec_gamma,
            ngram=self.spec_ngram, rounds=rounds,
            use_fused=self._spec_fused, medusa=self.medusa,
            prefix_len=self.prefix_len if self.dedup else 0)
        self.steps += rounds               # one target forward per round
        packed = np.asarray(packed)        # (3, rounds, G, B)
        tok_h, emit_h, fin_h = packed[0], packed[1], packed[2]
        if self.spec_break_even > 0:
            # accepted tokens per (round, active slot): an active row always
            # emits >= 1 token per round, so emit-count > 0 marks activity
            per_row = emit_h.sum(axis=1)             # (rounds, B)
            active = int((per_row > 0).sum())
            if active:
                rate = float(per_row.sum()) / active
                self._accept_ema = (
                    rate if self._accept_ema is None
                    else 0.5 * self._accept_ema + 0.5 * rate)
        for r in range(rounds):
            for slot in range(self.max_slots):
                if self._slot_req[slot] is None:
                    continue
                for c in range(G):
                    if emit_h[r, c, slot]:
                        self._slot_toks[slot].append(int(tok_h[r, c, slot]))
                if fin_h[r, 0, slot]:
                    req = self._slot_req[slot]
                    toks = self._slot_toks[slot]
                    self._slot_req[slot] = None
                    self._slot_toks[slot] = []
                    yield req.request_id, toks

    def pump(self, until_queue_below: int = 1) -> Iterator[tuple]:
        """Backpressure for STREAMING submission: drive decode rounds only
        until the pending queue is shorter than `until_queue_below`, then
        return control to the caller (who can encode + submit the next
        requests).  Interleaving submit/pump bounds host memory to
        O(until_queue_below) undispatched prompt embeddings instead of the
        whole workload (cli/serve.py uses this per loader batch)."""
        while True:
            yield from self._fill_free_slots()
            if len(self.queue) < until_queue_below:
                return
            yield from self._decode_round()

    def run(self) -> Iterator[tuple]:
        """Drives the loop until the queue and all slots drain, yielding
        (request_id, [tokens...]) as each request finishes."""
        # the fused-verify gate was decided against the CONSTRUCTION-time
        # ambient mesh; a different mesh active now (e.g. the engine was
        # built outside `jax.set_mesh`) could route the kernel-only
        # verify impl under an unsupported GSPMD mesh — re-check here and
        # downgrade to the plain (mesh-safe) path if needed
        if self._spec_fused:
            from ..models.decoder import supports_verify_chunk_step

            if not supports_verify_chunk_step(
                    self.cfg, self.state, self.spec_gamma + 1,
                    prefix_cols=self.prefix_cols if self.dedup else 0,
                    params=self.params):
                self._spec_fused = False
        while True:
            yield from self._fill_free_slots()
            if not any(r is not None for r in self._slot_req):
                if not self.queue:
                    return
                continue
            yield from self._decode_round()
