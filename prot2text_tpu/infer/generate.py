"""Batched autoregressive generation with a preallocated KV cache.

Mirrors the reference decode path — encoder+adapter fusion happens once, then
the LLM decodes from `inputs_embeds` (modeling_esm2llama_instruct.py:217-251),
so generated ids contain ONLY new tokens.  HF-parity details:
  * left-padded prompts; rope positions from cumsum(attention_mask)-1
    (HF GenerationMixin prepare_inputs_for_generation)
  * appended tokens get attention_mask=1 even after EOS; finished rows emit
    pad_token_id
  * greedy = argmax over fp32 logits; sampling supports temperature/top-k/top-p
    (flags at reference generate_instruct.py:43-48)

Whole loop is device-side: one jitted prefill + `lax.while_loop` decode with
static shapes — no host sync per token.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.decoder import (
    DecoderConfig, decoder_decode_step, decoder_forward, decoder_logits,
)
from .kvcache import init_kv_cache


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 256
    eos_token_id: int = 128009
    pad_token_id: int = 128002
    do_sample: bool = False
    temperature: float = 1.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    num_beams: int = 1
    # HF GenerationMixin beam knobs the reference inherits
    # (generate_instruct.py:43-48; HF BeamHypotheses semantics)
    length_penalty: float = 1.0
    early_stopping: bool = False
    # HF generate(prompt_lookup_num_tokens=...): n-gram lookup speculative
    # decoding (greedy-only, exact outputs; infer/speculative.py)
    prompt_lookup_tokens: int = 0
    prompt_lookup_ngram: int = 2


def resolve_generation_config(eos_token_id, pad_token_id,
                              gen_kwargs: dict) -> GenerationConfig:
    """HF-parity kwarg handling for model.generate surfaces: accepts either
    a `generation_config=GenerationConfig(...)` object (flat kwargs override
    its fields, as in HF GenerationMixin) or flat kwargs merged over the
    model's eos/pad defaults."""
    base = gen_kwargs.pop("generation_config", None)
    if base is not None:
        return dataclasses.replace(base, **gen_kwargs) if gen_kwargs else base
    # flat eos_token_id/pad_token_id kwargs override the model defaults
    # (HF GenerationMixin surface, e.g. generate(..., eos_token_id=...))
    return GenerationConfig(**{"eos_token_id": eos_token_id,
                               "pad_token_id": pad_token_id, **gen_kwargs})


def filter_logits(logits, gen_cfg: GenerationConfig):
    """Apply HF's warper pipeline in HF's order — temperature, then top-k,
    then top-p (transformers LogitsProcessorList ordering in
    GenerationMixin._get_logits_processor).  logits: (B, V) fp32."""
    logits = logits / jnp.maximum(gen_cfg.temperature, 1e-6)
    if gen_cfg.top_k is not None and gen_cfg.top_k > 0:
        kth = jax.lax.top_k(logits, gen_cfg.top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen_cfg.top_p is not None and gen_cfg.top_p < 1.0:
        # exact HF TopPLogitsWarper algorithm: stable ASCENDING sort,
        # remove tokens whose ascending cumulative mass <= 1 - top_p,
        # scatter the removal mask back by sort index (this reproduces
        # HF's tie behavior, where equal-valued tokens at the boundary are
        # dropped by index order rather than all kept), always keep top-1
        sort_idx = jnp.argsort(logits, axis=-1)          # ascending, stable
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove_sorted = cum <= (1.0 - gen_cfg.top_p)
        remove_sorted = remove_sorted.at[:, -1].set(False)  # min_tokens=1
        remove = jnp.zeros_like(remove_sorted)
        remove = jnp.put_along_axis(
            remove, sort_idx, remove_sorted, axis=-1, inplace=False)
        logits = jnp.where(remove, -jnp.inf, logits)
    return logits


def _sample_token(logits, gen_cfg: GenerationConfig, key):
    """logits: (B, V) fp32 → (B,) int32."""
    if not gen_cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        key, filter_logits(logits, gen_cfg), axis=-1).astype(jnp.int32)


def _bias_from_kv_mask(kv_mask, q_len: int, dtype=jnp.float32):
    """(B, T) 0/1 kv validity → (B, 1, q_len, T) additive bias (no causal —
    caller guarantees kv_mask only covers already-written slots)."""
    neg = jnp.finfo(dtype).min
    ok = kv_mask[:, None, None, :].astype(bool)
    ok = jnp.broadcast_to(ok, (kv_mask.shape[0], 1, q_len, kv_mask.shape[1]))
    return jnp.where(ok, jnp.zeros([], dtype), jnp.full([], neg, dtype))


def _prefill_bias(attention_mask, max_len: int, dtype=jnp.float32):
    """Prompt prefill bias over the full cache width: sequence-index causal
    within the prompt + key padding; slots >= P invalid."""
    B, P = attention_mask.shape
    neg = jnp.finfo(dtype).min
    idx = jnp.arange(P)
    causal = idx[None, :] <= idx[:, None]               # (P, P)
    key_ok = attention_mask[:, None, None, :].astype(bool)  # (B,1,1,P)
    ok = jnp.logical_and(causal[None, None], key_ok)    # (B,1,P,P)
    pad_cols = jnp.zeros((B, 1, P, max_len - P), bool)
    ok = jnp.concatenate([ok, pad_cols], axis=3)
    return jnp.where(ok, jnp.zeros([], dtype), jnp.full([], neg, dtype))


def run_generation(cfg, params, *, inputs_embeds, attention_mask, gen_cfg,
                   rng=None, attn_impl="xla", cache_dtype=None,
                   prompt_ids=None, prompt_ids_mask=None, kv_bits=None):
    """Dispatch greedy/sampling vs beam search on gen_cfg.num_beams
    (reference --num_beams flag, generate_instruct.py:43) vs prompt-lookup
    speculative decoding on gen_cfg.prompt_lookup_tokens (HF
    generate(prompt_lookup_num_tokens=...)).  prompt_ids/prompt_ids_mask:
    optional text-token ids the n-gram lookup may match in (the composed
    models pass their chat-prompt ids; the protein span is embeddings-only
    and has no ids)."""
    if kv_bits is not None and gen_cfg.num_beams > 1:
        raise ValueError("kv_bits quantized KV cache does not support "
                         "beam search")
    if gen_cfg.num_beams > 1:
        from .beam_search import beam_search

        return beam_search(
            cfg, params, inputs_embeds=inputs_embeds,
            attention_mask=attention_mask, gen_cfg=gen_cfg,
            num_beams=gen_cfg.num_beams,
            length_penalty=gen_cfg.length_penalty,
            early_stopping=gen_cfg.early_stopping,
            attn_impl=attn_impl, cache_dtype=cache_dtype, rng=rng)
    if gen_cfg.prompt_lookup_tokens > 0:
        if gen_cfg.do_sample:
            raise ValueError("prompt_lookup_tokens is greedy-only "
                             "(speculative decoding)")
        from .speculative import prompt_lookup_generate

        toks, _ = prompt_lookup_generate(
            cfg, params, inputs_embeds=inputs_embeds,
            attention_mask=attention_mask, gen_cfg=gen_cfg,
            prompt_ids=prompt_ids, prompt_ids_mask=prompt_ids_mask,
            gamma=gen_cfg.prompt_lookup_tokens,
            ngram=gen_cfg.prompt_lookup_ngram,
            attn_impl=attn_impl, cache_dtype=cache_dtype, kv_bits=kv_bits)
        return toks
    return generate(cfg, params, inputs_embeds=inputs_embeds,
                    attention_mask=attention_mask, gen_cfg=gen_cfg, rng=rng,
                    attn_impl=attn_impl, cache_dtype=cache_dtype,
                    kv_bits=kv_bits)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "gen_cfg", "attn_impl", "cache_dtype", "kv_bits"),
)
def generate(
    cfg: DecoderConfig,
    params,
    *,
    inputs_embeds,        # (B, P, H) left-padded prompt embeddings
    attention_mask,       # (B, P)
    gen_cfg: GenerationConfig,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
    cache_dtype=None,
    kv_bits=None,         # 8 = int8 KV cache (infer/kvcache.py) — halves
                          # the decode-attention HBM bytes at the measured
                          # single-chip bandwidth floor
):
    """Returns (B, max_new_tokens) int32, pad-filled after EOS."""
    B, P, H = inputs_embeds.shape
    T = P + gen_cfg.max_new_tokens
    if kv_bits is not None:
        # the fused int8 write kernel's tile groups are 32 sublanes — pad
        # the cache width up; the extra columns' kv_mask stays 0 forever
        T = -(-T // 32) * 32
    dtype = cache_dtype or inputs_embeds.dtype
    if rng is None:
        rng = jax.random.PRNGKey(0)

    positions = jnp.clip(
        jnp.cumsum(attention_mask, axis=1) - 1, 0, None
    ).astype(jnp.int32)                                   # (B, P)
    last_pos = positions[:, -1]                           # (B,)

    from ..models.decoder import contiguous_lengths

    cache = init_kv_cache(cfg, B, T, dtype, kv_bits=kv_bits)
    bias = _prefill_bias(attention_mask, T)
    # prefill is forward-only: force flash where eligible (wins at every
    # causal S, not just the auto rule's >=1024 training threshold)
    h, cache = decoder_forward(
        cfg, params, inputs_embeds=inputs_embeds.astype(dtype), bias=bias,
        positions=positions, kv_cache=cache, cache_index=0,
        attn_impl="flash" if attn_impl == "auto" else attn_impl,
        attn_lengths=contiguous_lengths(attention_mask),
    )
    logits0 = decoder_logits(cfg, params, h[:, -1:])[:, 0]  # (B, V)

    rng, key0 = jax.random.split(rng)
    tok0 = _sample_token(logits0, gen_cfg, key0)
    finished0 = tok0 == gen_cfg.eos_token_id

    tokens = jnp.full((B, gen_cfg.max_new_tokens), gen_cfg.pad_token_id,
                      jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)

    kv_mask = jnp.concatenate(
        [attention_mask.astype(jnp.int32),
         jnp.zeros((B, T - P), jnp.int32)], axis=1)

    def cond(state):
        t, _, _, _, finished, _ = state
        return jnp.logical_and(t < gen_cfg.max_new_tokens,
                               ~jnp.all(finished))

    def body(state):
        t, tokens, cache, kv_mask, finished, rng = state
        prev = tokens[:, t - 1]
        emb = params["embed_tokens"][prev][:, None, :].astype(dtype)  # (B,1,H)
        pos = (last_pos + t)[:, None]                     # (B, 1)
        # bias over ALREADY-written slots; the current token's kv is handled
        # separately inside decoder_decode_step (profiler-driven: avoids the
        # per-layer cache copies of the generic scan path)
        bias = _bias_from_kv_mask(kv_mask, 1)
        h, cache = decoder_decode_step(
            cfg, params, token_embeds=emb, bias_old=bias, positions=pos,
            kv_cache=cache, cache_index=P + t - 1,
        )
        kv_mask = jax.lax.dynamic_update_slice(
            kv_mask, jnp.ones((B, 1), jnp.int32), (0, P + t - 1))
        logits = decoder_logits(cfg, params, h)[:, 0]
        rng, key = jax.random.split(rng)
        tok = _sample_token(logits, gen_cfg, key)
        tok = jnp.where(finished, gen_cfg.pad_token_id, tok)
        tokens = tokens.at[:, t].set(tok)
        finished = jnp.logical_or(finished, tok == gen_cfg.eos_token_id)
        return (t + 1, tokens, cache, kv_mask, finished, rng)

    state = (jnp.asarray(1), tokens, cache, kv_mask, finished0, rng)
    _, tokens, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens
