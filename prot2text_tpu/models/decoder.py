"""Shared causal-decoder core for Llama-3.x and Qwen3 (pure JAX, layer-scan).

Mirrors HF `LlamaForCausalLM` / `Qwen3ForCausalLM` numerics, as consumed by the
reference (models/modeling_esm2llama_instruct.py:204-215, esmc_qwen_arc.py:208)
  * RMSNorm in fp32 (pre-attn, pre-mlp, final)
  * GQA with num_kv_heads, rotary (half-split), fp32 softmax
  * SwiGLU MLP: down(silu(gate(x)) * up(x))
  * optional per-head q/k RMSNorm (Qwen3), optional llama3 rope scaling
  * logits computed in fp32; optional tied embeddings

KV-cached decoding: the cache is a (L, B, Hkv, T, D) pytree (batch dims
leading so every attention einsum lowers without operand transposes —
infer/kvcache.py documents the layout history); prefill writes whole prompt
slabs inside the layer scan, and single-token decoding goes through
`decoder_decode_step` (cache read-only in the scan, one in-place slot write
per step).  Static shapes throughout — the whole decode loop jits once
(replacing HF GenerationMixin's dynamic cache, generate_instruct.py:72-87).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .transformer import apply_rope, attention, linear, repeat_kv, rms_norm


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    intermediate_size: int
    head_dim: int
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    tie_word_embeddings: bool = False
    qk_norm: bool = False           # Qwen3
    rope_scaling: Optional[str] = None  # None | "llama3"
    rope_scaling_factor: float = 8.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192


def init_decoder_params(cfg: DecoderConfig, key, dtype=jnp.float32):
    k = iter(jax.random.split(key, 8))
    h, m, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim

    def dense(kk, din, dout):
        return {"kernel": jax.random.normal(kk, (din, dout), dtype) * 0.02}

    def stack(make):
        base = next(k)
        leaves = [make(jax.random.fold_in(base, i)) for i in range(L)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *leaves)

    def layer(kk):
        p = {
            "input_ln": {"scale": jnp.ones((h,), dtype)},
            "q_proj": dense(jax.random.fold_in(kk, 0), h, qd),
            "k_proj": dense(jax.random.fold_in(kk, 1), h, kvd),
            "v_proj": dense(jax.random.fold_in(kk, 2), h, kvd),
            "o_proj": dense(jax.random.fold_in(kk, 3), qd, h),
            "post_attn_ln": {"scale": jnp.ones((h,), dtype)},
            "gate_proj": dense(jax.random.fold_in(kk, 4), h, m),
            "up_proj": dense(jax.random.fold_in(kk, 5), h, m),
            "down_proj": dense(jax.random.fold_in(kk, 6), m, h),
        }
        if cfg.qk_norm:
            p["q_norm"] = {"scale": jnp.ones((cfg.head_dim,), dtype)}
            p["k_norm"] = {"scale": jnp.ones((cfg.head_dim,), dtype)}
        return p

    params = {
        "embed_tokens": jax.random.normal(next(k), (cfg.vocab_size, h), dtype) * 0.02,
        "layers": stack(layer),
        "final_ln": {"scale": jnp.ones((h,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(next(k), h, cfg.vocab_size)
    return params


def _rope_inv_freq_scale(cfg: DecoderConfig, inv_freq):
    """HF `_compute_llama3_parameters` smooth-interpolated frequency scaling."""
    if cfg.rope_scaling != "llama3":
        return inv_freq
    factor = cfg.rope_scaling_factor
    low = cfg.rope_low_freq_factor
    high = cfg.rope_high_freq_factor
    old_len = cfg.rope_original_max_position
    low_wavelen = old_len / low
    high_wavelen = old_len / high
    wavelen = 2 * jnp.pi / inv_freq
    scaled = jnp.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (old_len / wavelen - low) / (high - low)
    smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    is_medium = jnp.logical_and(wavelen >= high_wavelen, wavelen <= low_wavelen)
    return jnp.where(is_medium, smoothed, scaled)


def decoder_rope_cos_sin(cfg: DecoderConfig, positions):
    """positions: (B, S) or (S,) int → cos/sin fp32 with optional scaling."""
    D = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D)
    )
    inv_freq = _rope_inv_freq_scale(cfg, inv_freq)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def embed_tokens(params, input_ids):
    return params["embed_tokens"][input_ids]


def contiguous_lengths(attention_mask):
    """(B, S) 0/1 mask whose valid run is CONTIGUOUS per row (every collator
    layout here: [pad, prompt, description, pad]) → (kv_start, kv_len) int32.
    Fully-masked rows get kv_len=1 so kernels never see an empty softmax —
    their outputs are ignored downstream either way."""
    m = attention_mask.astype(jnp.int32)
    kv_len = jnp.maximum(m.sum(axis=1), 1)
    kv_start = jnp.argmax(m, axis=1).astype(jnp.int32)
    return kv_start, kv_len.astype(jnp.int32)


def kv_cache_layout(cfg: DecoderConfig) -> str:
    """Measured per-head-dim cache layouts (v5e, profiler-driven):

    * "bktd" (L, B, Hkv, T, D) — batch dims leading, every decode einsum a
      natural dot_general.  Physically DENSE only when D fills the 128-lane
      tile (D=128: Llama-8B, Qwen3-14B — the flagships): +5% decode vs the
      T-leading layout (no per-step layout repack copies).
    * "tbkd" (L, T, B, Hkv, D) — for D=64 models (Llama-1B/3B, ESMC heads):
      a trailing (T, 64) tile row is half-padded, which taxes every cache
      read ~2x, so XLA's preferred transposed layout + the slab-write Pallas
      kernel wins there despite its repack copies."""
    return "bktd" if cfg.head_dim % 128 == 0 else "tbkd"


def decoder_forward(
    cfg: DecoderConfig,
    params,
    *,
    inputs_embeds,          # (B, S, H)
    bias,                   # fp32 additive (B, 1, S, T)
    positions,              # (B, S) int32 rope positions
    kv_cache=None,          # {"k","v"} per kv_cache_layout(cfg), or None
    cache_index=None,       # int32 write offset into T: scalar, or a (B,)
                            # vector of per-row offsets (bktd layouts only —
                            # the serving engine's speculative chunk verify
                            # writes each slot's chunk at its own length)
    attn_impl: str = "xla",
    remat: bool = False,
    lora=None,              # optional LoRA tree (models/lora.py layout)
    lora_scale: float = 1.0,
    attn_lengths=None,      # optional (kv_start, kv_len) contiguous-mask
                            # assertion → masked flash under attn_impl="auto"
    num_layers: Optional[int] = None,  # run only the first N layers
    final_norm: bool = True,           # skip for HF hidden_states[N] parity
    prefix_kv=None,         # optional SHARED-prefix KV, stored ONCE for the
                            # whole batch (HBM dedup): {"k","v"[,scales]}
                            # with batch dim 1, per kv_cache_layout(cfg).
                            # Every query additionally attends these Pc
                            # columns (placed BEFORE the cache columns, the
                            # same order as a prefix seeded into the cache)
    prefix_bias=None,       # fp32 additive (B, 1, 1, Pc) or (B, 1, S, Pc)
                            # over the prefix columns (per-row gating: a
                            # row that must not see the prefix masks it)
):
    """Returns (hidden_states, new_kv_cache).

    With `lora`, targeted projections compute the low-rank side path
    y = xW + scale·(xA)B instead of materializing merged weights — O(r)
    memory for 14B-scale frozen bases (SURVEY.md §7 hard part #5).

    `num_layers=N` + `final_norm=False` reproduces HF's
    `output_hidden_states=True` → `hidden_states[N]` (pre-final-norm)
    while scanning ONLY the first N stacked layer params — the contrastive
    text tower (reference train_contrast.py:284-310 runs the full 40-layer
    Qwen and throws away layers 17..40; here it is ~60% less compute)."""
    from .transformer import linear_lora

    if num_layers is not None:
        # cached use (self-speculative draft prefill) requires the caller's
        # kv_cache leading dim to equal num_layers — the layer scan zips
        # the sliced params with the cache
        if kv_cache is not None and kv_cache["k"].shape[0] != num_layers:
            raise ValueError("num_layers must match the kv_cache layer dim")
        params = dict(params,
                      layers=jax.tree_util.tree_map(
                          lambda a: a[:num_layers], params["layers"]))
        if lora is not None:
            lora = dict(lora,
                        layers=jax.tree_util.tree_map(
                            lambda a: a[:num_layers], lora["layers"]))

    if prefix_kv is not None:
        # batch-broadcast second cache operand (serving prefix-KV dedup:
        # the shared chat-template header's KV lives ONCE in HBM instead
        # of replicated per slot).  XLA einsum attention only — the
        # flash/ring kernels assert self-contained windows.
        if attn_impl != "xla":
            raise ValueError("prefix_kv requires attn_impl='xla'")
        if attn_lengths is not None:
            raise ValueError("prefix_kv is incompatible with attn_lengths")
        if kv_cache is None:
            raise ValueError("prefix_kv requires a kv_cache")
        if prefix_bias is None:
            raise ValueError("prefix_kv requires prefix_bias")

    if attn_impl == "ring":
        # ring = training/uncached path only; cached prefill (generation)
        # attends over a wider cache whose T dim is not sequence-sharded
        if kv_cache is not None:
            attn_impl = "xla"
        elif attn_lengths is None:
            raise ValueError("attn_impl='ring' needs attn_lengths "
                             "(contiguous_lengths of the attention mask)")

    B, S, _ = inputs_embeds.shape
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    n_rep = H // Hkv

    cos, sin = decoder_rope_cos_sin(cfg, positions)
    h = inputs_embeds
    scaling = D ** -0.5
    lora_layers = lora["layers"] if lora is not None else None

    # shared-prefix leaves normalized to batch-dim-1 (1, Hkv, Pc, D) views
    # (the tbkd layout stores (L, Pc, 1, Hkv, D)) and zipped into the layer
    # scan as extra xs — read-only, never written back
    pfx_xs = None
    if prefix_kv is not None:
        if kv_cache_layout(cfg) == "bktd":
            pk_all, pv_all = prefix_kv["k"], prefix_kv["v"]
        else:
            pk_all = prefix_kv["k"].transpose(0, 2, 3, 1, 4)
            pv_all = prefix_kv["v"].transpose(0, 2, 3, 1, 4)
        if "k_scale" in prefix_kv:
            pfx_xs = (pk_all, pv_all,
                      prefix_kv["k_scale"], prefix_kv["v_scale"])
        else:
            pfx_xs = (pk_all, pv_all)

    def block(lp, ll, x, layer_cache, layer_pfx=None):
        def proj(name, x_):
            lo = None
            if ll is not None:
                # {"A","B"} at the kernel leaf (kernel_q / kernel_q4* for
                # quantized frozen bases — QLoRA-style side path)
                from .lora import lora_at

                lo = lora_at(ll.get(name))
            return linear_lora(lp[name], lo, x_, lora_scale)

        xn = rms_norm(lp["input_ln"], x, cfg.rms_norm_eps)
        q = proj("q_proj", xn).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = proj("k_proj", xn).reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        v = proj("v_proj", xn).reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        if cfg.qk_norm:
            q = rms_norm(lp["q_norm"], q, cfg.rms_norm_eps)
            k = rms_norm(lp["k_norm"], k, cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        vec_idx = getattr(cache_index, "ndim", 0) == 1
        if vec_idx:
            # per-row write columns (speculative serving verify): row b's
            # S-token chunk lands at [cache_index[b], cache_index[b]+S).
            # NOT a scatter: TPU scatters with per-row dynamic indices
            # serialize.  Build the full-width update with a one-hot
            # batched matmul over the tiny chunk dim (MXU, ~0.3 GFLOP at
            # serving shapes) and one select — bandwidth-bound at ~3
            # cache-sized streams per layer.
            Tdim = (layer_cache[0].shape[2]
                    if kv_cache_layout(cfg) == "bktd"
                    else layer_cache[0].shape[0])
            colsT = jnp.arange(Tdim)
            oh = ((colsT[None, :, None] - cache_index[:, None, None])
                  == jnp.arange(S)[None, None, :])           # (B, T, S)
            sel3 = oh.any(axis=2)                            # (B, T)

            def place(chunk):
                """(B, Hkv, S, ...) chunk → (B, Hkv, T, ...) full-width."""
                if chunk.ndim == 4:
                    return jnp.einsum(
                        "bts,bhsd->bhtd", oh.astype(chunk.dtype), chunk,
                        preferred_element_type=chunk.dtype)
                return jnp.einsum(
                    "bts,bhs->bht", oh.astype(chunk.dtype), chunk,
                    preferred_element_type=chunk.dtype)
        if layer_cache is not None and len(layer_cache) == 4:
            # int8 KV cache (kv_bits=8): quantize the slab per (head, token)
            # vector, write values + scales, and attend over the DEQUANTIZED
            # cache — prefill sees exactly what later decode steps will read
            from .quant import quantize_kv

            ck, cv, sk, sv = layer_cache
            kq, ks = quantize_kv(k)                      # (B, Hkv, S, ·)
            vq, vs = quantize_kv(v)
            if vec_idx:
                s4 = sel3[:, None, :, None]
                s3 = sel3[:, None, :]
                ck = jnp.where(s4, place(kq).astype(jnp.int8), ck)
                cv = jnp.where(s4, place(vq).astype(jnp.int8), cv)
                sk = jnp.where(s3, place(ks), sk)
                sv = jnp.where(s3, place(vs), sv)
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, kq.astype(jnp.int8), (0, 0, cache_index, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vq.astype(jnp.int8), (0, 0, cache_index, 0))
                sk = jax.lax.dynamic_update_slice(
                    sk, ks, (0, 0, cache_index))
                sv = jax.lax.dynamic_update_slice(
                    sv, vs, (0, 0, cache_index))
            k_full = (ck.astype(jnp.float32) * sk[..., None]).astype(x.dtype)
            v_full = (cv.astype(jnp.float32) * sv[..., None]).astype(x.dtype)
            new_cache = (ck, cv, sk, sv)
        elif layer_cache is not None:
            ck, cv = layer_cache
            if kv_cache_layout(cfg) == "bktd":
                # (B, Hkv, T, D) — same dim order as k/v (B, Hkv, S, D):
                # slab write + read with NO transposes
                if vec_idx:
                    s4 = sel3[:, None, :, None]
                    ck = jnp.where(s4, place(k).astype(ck.dtype), ck)
                    cv = jnp.where(s4, place(v).astype(cv.dtype), cv)
                else:
                    ck = jax.lax.dynamic_update_slice(
                        ck, k.astype(ck.dtype), (0, 0, cache_index, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, v.astype(cv.dtype), (0, 0, cache_index, 0))
                k_full, v_full = ck, cv
            else:
                # (T, B, Hkv, D) sequence-leading (dense for D=64)
                if vec_idx:
                    s_t = sel3.T[:, :, None, None]       # (T, B, 1, 1)
                    ck = jnp.where(
                        s_t, place(k).transpose(2, 0, 1, 3).astype(ck.dtype),
                        ck)
                    cv = jnp.where(
                        s_t, place(v).transpose(2, 0, 1, 3).astype(cv.dtype),
                        cv)
                else:
                    k_t = k.transpose(2, 0, 1, 3).astype(ck.dtype)
                    v_t = v.transpose(2, 0, 1, 3).astype(cv.dtype)
                    ck = jax.lax.dynamic_update_slice(
                        ck, k_t, (cache_index, 0, 0, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, v_t, (cache_index, 0, 0, 0))
                k_full = ck.transpose(1, 2, 0, 3)        # (B, Hkv, T, D)
                v_full = cv.transpose(1, 2, 0, 3)
            new_cache = (ck, cv)
        else:
            k_full, v_full = k, v
            new_cache = None
        bias_l = bias
        if layer_pfx is not None:
            # prepend the batch-broadcast shared-prefix columns: ONE
            # concatenated einsum keeps the softmax/weighted-sum reduction
            # identical to a prefix physically seeded into the cache
            if len(layer_pfx) == 4:
                pk, pv, psk, psv = layer_pfx
                pkf = (pk.astype(jnp.float32)
                       * psk[..., None]).astype(k_full.dtype)
                pvf = (pv.astype(jnp.float32)
                       * psv[..., None]).astype(v_full.dtype)
            else:
                pkf = layer_pfx[0].astype(k_full.dtype)
                pvf = layer_pfx[1].astype(v_full.dtype)
            Pc = pkf.shape[2]
            k_full = jnp.concatenate(
                [jnp.broadcast_to(pkf, (B,) + pkf.shape[1:]), k_full],
                axis=2)
            v_full = jnp.concatenate(
                [jnp.broadcast_to(pvf, (B,) + pvf.shape[1:]), v_full],
                axis=2)
            pb = jnp.broadcast_to(prefix_bias.astype(jnp.float32),
                                  (B, 1, S, Pc))
            bias_l = jnp.concatenate([pb, bias], axis=-1)
        q = (q.astype(jnp.float32) * scaling).astype(q.dtype)
        if attn_lengths is not None:
            # self-attention covers kv slots [0, S) even under a wider
            # prefill cache (cache_index=0 on every prefill call site) —
            # slice so the masked flash kernel sees only live keys
            k_att, v_att = k_full[:, :, :S], v_full[:, :, :S]
            a = attention(
                q, repeat_kv(k_att, n_rep), repeat_kv(v_att, n_rep),
                bias[..., :S], impl=attn_impl,
                lengths=(attn_lengths[0], attn_lengths[1], True),
            )
        else:
            a = attention(
                q, repeat_kv(k_full, n_rep), repeat_kv(v_full, n_rep),
                bias_l, impl=attn_impl,
            )
        a = a.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        x = x + proj("o_proj", a)
        xn = rms_norm(lp["post_attn_ln"], x, cfg.rms_norm_eps)
        gate = jax.nn.silu(proj("gate_proj", xn).astype(jnp.float32))
        up = proj("up_proj", xn).astype(jnp.float32)
        y = proj("down_proj", (gate * up).astype(xn.dtype))
        return x + y, new_cache

    body = block
    if remat:
        body = jax.checkpoint(block, prevent_cse=False)

    if kv_cache is not None and "k_scale" in kv_cache:
        if kv_cache_layout(cfg) != "bktd":
            raise ValueError("int8 KV cache requires the bktd layout")

        def step(c, xs):
            c, new_cache = body(xs[0], xs[1], c, xs[2:6], xs[6:] or None)
            return c, new_cache

        h, caches = jax.lax.scan(
            step, h,
            (params["layers"], lora_layers, kv_cache["k"], kv_cache["v"],
             kv_cache["k_scale"], kv_cache["v_scale"]) + (pfx_xs or ())
        )
        new_kv = {"k": caches[0], "v": caches[1],
                  "k_scale": caches[2], "v_scale": caches[3]}
    elif kv_cache is not None:
        def step(c, xs):
            c, new_cache = body(xs[0], xs[1], c, xs[2:4], xs[4:] or None)
            return c, new_cache

        h, caches = jax.lax.scan(
            step, h,
            (params["layers"], lora_layers, kv_cache["k"], kv_cache["v"])
            + (pfx_xs or ())
        )
        new_kv = {"k": caches[0], "v": caches[1]}
    else:
        def step(c, xs):
            lp, ll = xs
            c, _ = body(lp, ll, c, None)
            return c, None

        h, _ = jax.lax.scan(step, h, (params["layers"], lora_layers))
        new_kv = None

    if final_norm:
        h = rms_norm(params["final_ln"], h, cfg.rms_norm_eps)
    return h, new_kv


def _fetch_layer(sub, li):
    """Per-layer view of a stacked leaf dict (norms, small projections)."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False),
        sub)


def _stacked_proj(layers, name, li, x_, on_tpu_q4, interpret=False):
    """Layer-li projection over the STACKED weight buffers, shared by the
    single-token decode step and the chunk-verify step.  int4 leaves go
    through the scalar-prefetch STACKED kernel — a pallas operand must be
    materialized, so slicing the (L, K/2, N) buffer per layer (scan xs or
    dynamic_index) copies the whole layer's weights every step; the
    stacked kernel's index_map reads tiles straight from the stacked
    buffer instead (measured on-chip: scripts/bench_stacked_matmul.py).
    int8/bf16 leaves keep dynamic_index — XLA fuses that slice into the
    dot_general operand read (the 8B int8 decode measures at the HBM
    floor, scripts/bench_decode_gap.py)."""
    from .transformer import linear

    sub = layers[name]
    rows = 1
    for d in x_.shape[:-1]:
        rows *= d
    if "kernel_q4w" in sub:
        from ..kernels.quant_matmul import (
            quant_matmul_int4_pairs_stacked, supports_quant_matmul_pairs,
        )

        wp = sub["kernel_q4w"]                 # (L, K/8, N) i32 pairs
        if (on_tpu_q4 and rows <= 256
                and supports_quant_matmul_pairs(wp.shape[1] * 8,
                                                wp.shape[2])):
            lead = x_.shape[:-1]
            y = quant_matmul_int4_pairs_stacked(
                x_.reshape(-1, x_.shape[-1]), wp, sub["scale"], li,
                out_dtype=x_.dtype, interpret=interpret)
            if "bias" in sub:
                y = y + jax.lax.dynamic_index_in_dim(
                    sub["bias"], li, 0, keepdims=False).astype(y.dtype)
            return y.reshape(*lead, wp.shape[-1])
    if "kernel_q4p" in sub:
        from ..kernels.quant_matmul import (
            quant_matmul_int4_planes_stacked, supports_quant_matmul_planes,
        )

        wp = sub["kernel_q4p"]                 # (L, K/8, N) i32 planes
        if (on_tpu_q4 and rows <= 256
                and supports_quant_matmul_planes(wp.shape[1] * 8,
                                                 wp.shape[2])):
            lead = x_.shape[:-1]
            y = quant_matmul_int4_planes_stacked(
                x_.reshape(-1, x_.shape[-1]), wp, sub["scale"], li,
                out_dtype=x_.dtype, interpret=interpret)
            if "bias" in sub:
                y = y + jax.lax.dynamic_index_in_dim(
                    sub["bias"], li, 0, keepdims=False).astype(y.dtype)
            return y.reshape(*lead, wp.shape[-1])
    if "kernel_q4" in sub:
        from ..kernels.quant_matmul import (
            quant_matmul_int4_stacked, supports_quant_matmul,
        )

        wp = sub["kernel_q4"]                  # (L, K/2, N)
        if (on_tpu_q4 and rows <= 256
                and supports_quant_matmul(wp.shape[1] * 2, wp.shape[2],
                                          bits=4)):
            lead = x_.shape[:-1]
            y = quant_matmul_int4_stacked(
                x_.reshape(-1, x_.shape[-1]), wp, sub["scale"], li,
                out_dtype=x_.dtype, interpret=interpret)
            if "bias" in sub:
                y = y + jax.lax.dynamic_index_in_dim(
                    sub["bias"], li, 0, keepdims=False).astype(y.dtype)
            return y.reshape(*lead, wp.shape[-1])
    return linear(_fetch_layer(sub, li), x_)


_TP_COL_PROJS = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_TP_ROW_PROJS = ("o_proj", "down_proj")


_Q4_KEYS = ("kernel_q4p", "kernel_q4w", "kernel_q4")


def _tp_layer_specs(layers, tp_axis, ntp):
    """PartitionSpec tree mirroring `params["layers"]` for manual tensor
    parallelism (Megatron layout over the stacked (L, K, N) buffers):
    column-parallel q/k/v/gate/up shard the OUTPUT dim, row-parallel
    o/down shard the INPUT dim (their partial sums are psum'd in the step
    body), per-output int8 scales follow their kernel's output dim, norms
    replicate.  int4 packed words: the OUTPUT dim slices through every
    packing, so column-parallel leaves shard directly; row-parallel
    leaves require the SEGMENT-repacked kernel_q4*_tp{ntp} form
    (models/quant.repack_int4_for_tp — the interleaved plane packing does
    not slice on K).  Returns None when a leaf format is unsupported —
    un-repacked row-parallel int4, a repack for a different ntp, or a
    biased row projection (bias would be added once per shard) — and the
    caller falls back to the GSPMD path."""
    row_q4 = tuple(f"{k}_tp{ntp}" for k in _Q4_KEYS)
    specs = {}
    for name, sub in layers.items():
        if name in _TP_COL_PROJS or name in _TP_ROW_PROJS:
            col = name in _TP_COL_PROJS
            s = {}
            for k in sub:
                if k in ("kernel", "kernel_q"):
                    s[k] = (P(None, None, tp_axis) if col
                            else P(None, tp_axis, None))
                elif col and k in _Q4_KEYS:
                    s[k] = P(None, None, tp_axis)
                elif not col and k in row_q4:
                    s[k] = P(None, tp_axis, None)
                elif k == "scale":
                    s[k] = P(None, None, tp_axis) if col else P()
                elif k == "bias" and col:
                    s[k] = P(None, tp_axis)
                else:
                    return None
            specs[name] = s
        else:
            specs[name] = jax.tree_util.tree_map(lambda _: P(), sub)
    return specs


def _tp_param_specs(params, tp_axis, ntp):
    lspecs = _tp_layer_specs(params["layers"], tp_axis, ntp)
    if lspecs is None:
        return None
    return {k: (lspecs if k == "layers"
                else jax.tree_util.tree_map(lambda _: P(), v))
            for k, v in params.items()}


def _tp_ntp(tctx) -> int:
    """tp axis size of a tp_batch_shard_ctx result."""
    return dict(tctx[0].shape)[tctx[2]]


def _strip_tp_keys(params, ntp):
    """Inside the manual-TP shard_map body each shard's slice of a
    repacked kernel_q4*_tp{ntp} leaf IS a normally-packed local buffer —
    restore the plain key so the stacked Pallas dispatch recognizes it."""
    suffix = f"_tp{ntp}"
    if not any(isinstance(sub, dict) and any(k.endswith(suffix) for k in sub)
               for sub in params["layers"].values()):
        return params
    layers = {
        name: ({k[:-len(suffix)] if k.endswith(suffix) else k: v
                for k, v in sub.items()} if isinstance(sub, dict) else sub)
        for name, sub in params["layers"].items()}
    return {**params, "layers": layers}


def _tp_local_cfg(cfg: DecoderConfig, ntp: int) -> DecoderConfig:
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // ntp,
        num_kv_heads=cfg.num_kv_heads // ntp)


def decoder_decode_step(
    cfg: DecoderConfig,
    params,
    *,
    token_embeds,
    bias_old,
    positions,
    kv_cache,
    cache_index,
    num_layers: Optional[int] = None,
    prefix_kv=None,
    prefix_bias=None,
):
    """Single-token decode step (see `_decoder_decode_step_impl` for the
    kernel-level docs).  On a >1-device batch-axes-only ambient mesh the
    whole step body is shard_map'd over (dp, fsdp) — params and the
    batch-broadcast prefix KV replicated, every batch-dim operand sharded —
    so each device runs the single-chip program (Pallas kernels included)
    on its batch slice (kernels/shard.py; VERDICT r3 #2: the reference's
    cuDNN/NCCL kernels work under DDP, train_contrast.py:611-614)."""
    from ..kernels.shard import (
        batch_dim_spec, batch_shard_ctx, tp_batch_shard_ctx,
    )

    layout = kv_cache_layout(cfg)
    ctx = batch_shard_ctx(token_embeds.shape[0])
    tctx = param_specs = None
    if ctx is None:
        tctx = tp_batch_shard_ctx(token_embeds.shape[0], cfg.num_kv_heads,
                                  cfg.num_heads)
        if tctx is not None:
            param_specs = _tp_param_specs(params, tctx[2], _tp_ntp(tctx))
    if ctx is None and param_specs is None:
        return _decoder_decode_step_impl(
            cfg, params, token_embeds=token_embeds, bias_old=bias_old,
            positions=positions, kv_cache=kv_cache, cache_index=cache_index,
            num_layers=num_layers, prefix_kv=prefix_kv,
            prefix_bias=prefix_bias)
    if ctx is not None:
        mesh, axes = ctx
        tp_axis = None
        pspec = P()
        prefix_spec = P()
        run_cfg = cfg
        # bktd cache leaves (L, B, Hkv, T[, D]) batch at dim 1 (scales
        # too); tbkd leaves (L, T, B, Hkv, D) batch at dim 2
        cache_spec = batch_dim_spec(axes, 1 if layout == "bktd" else 2)
    else:
        # manual tensor parallelism (+ optional batch axes): column/row-
        # parallel weights, KV cache sharded over heads, psums in the body
        mesh, axes, tp_axis = tctx
        pspec = param_specs
        # prefix leaves carry Hkv at dim 2 (bktd: (L, 1, Hkv, Pc[, D]))
        # or dim 3 (tbkd: (L, Pc, 1, Hkv, D))
        prefix_spec = (P() if prefix_kv is None
                       else P(None, None, tp_axis) if layout == "bktd"
                       else P(None, None, None, tp_axis))
        run_cfg = _tp_local_cfg(cfg, dict(mesh.shape)[tp_axis])
        cache_spec = (P(None, axes or None, tp_axis) if layout == "bktd"
                      else P(None, None, axes or None, tp_axis))
    bspec = batch_dim_spec(axes, 0) if axes else P()
    idx_spec = bspec if getattr(cache_index, "ndim", 0) == 1 else P()

    def body(params_, token_embeds_, bias_old_, positions_, kv_cache_,
             cache_index_, prefix_kv_, prefix_bias_):
        if tp_axis is not None:
            params_ = _strip_tp_keys(params_, _tp_ntp(tctx))
        return _decoder_decode_step_impl(
            run_cfg, params_, token_embeds=token_embeds_,
            bias_old=bias_old_, positions=positions_, kv_cache=kv_cache_,
            cache_index=cache_index_, num_layers=num_layers,
            prefix_kv=prefix_kv_, prefix_bias=prefix_bias_,
            tp_axis=tp_axis)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, bspec, bspec, bspec, cache_spec, idx_spec,
                  prefix_spec,
                  P() if prefix_bias is None else bspec),
        out_specs=(bspec, cache_spec),
        check_vma=False,  # pallas_call inside needs the checker off
    )(params, token_embeds, bias_old, positions, kv_cache, cache_index,
      prefix_kv, prefix_bias)


def _decoder_decode_step_impl(
    cfg: DecoderConfig,
    params,
    *,
    token_embeds,        # (B, 1, H) — current token embedding
    bias_old,            # fp32 (B, 1, 1, T) over ALREADY-WRITTEN cache slots
    positions,           # (B, 1) rope positions of the current token
    kv_cache,            # {"k","v"}: (L, B, Hkv, T, D)
    cache_index,         # int32 slot for the current token's kv: scalar
                         # (lockstep generate) or (B,) per-row (continuous
                         # batching — every slot decodes at its own length)
    num_layers: Optional[int] = None,  # run only the first N layers against
                         # an N-layer cache (self-speculative draft: the
                         # stacked params stay FULL — the layer scan and the
                         # scalar-prefetch kernels just index li < N, so no
                         # weight slice/copy ever materializes)
    prefix_kv=None,      # optional batch-broadcast SHARED-prefix KV, batch
                         # dim 1 per layout (serving prefix-KV dedup: the
                         # shared chat header's KV lives once in HBM, not
                         # replicated per slot); its Pc columns sit BEFORE
                         # the cache columns in the softmax
    prefix_bias=None,    # fp32 (B, 1, 1, Pc) additive over those columns
    tp_axis=None,        # manual-TP: mesh axis name for the row-parallel
                         # o_proj/down_proj partial-sum psums (cfg is then
                         # the PER-SHARD head config; wrapper above)
):
    """Single-token decode step optimized from profiler evidence: the
    generic scan-over-(params, cache) path spends ~45% of decode time
    copying per-layer caches through scan ys (dynamic_update_slice + copy
    ops in the trace).  Here the FULL cache rides in the scan carry and each
    layer (a) reads its slice, (b) computes attention as
    [stale-cache logits ‖ current-token logit] — no updated-cache temp, no
    repeat_kv materialization (grouped-head einsum) — and (c) writes only
    the (B, Hkv, 1, D) new kv slot back.  The (L, B, Hkv, T, D)
    batch-leading layout keeps every einsum's batch dims leading, so XLA
    assigns ONE layout to the cache and the while-carry slot write stays
    in place (the round-1 T-leading layout triggered two full-cache layout
    copies per step).  Returns (h (B,1,Hid), new_cache)."""
    B = token_embeds.shape[0]
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = H // Hkv
    layout = kv_cache_layout(cfg)
    T = kv_cache["k"].shape[3 if layout == "bktd" else 1]
    L = num_layers if num_layers is not None else cfg.num_layers

    cos, sin = decoder_rope_cos_sin(cfg, positions)   # (B, 1, D)
    scaling = D ** -0.5
    bias_o = bias_old.reshape(B, 1, 1, T).astype(jnp.float32)
    ck_all = kv_cache["k"]
    cv_all = kv_cache["v"]

    layers = params["layers"]
    from ..kernels.attention import pallas_single_device_ok

    # plain pallas_calls don't partition under GSPMD — the gate passes on
    # a single device OR inside the batch shard_map wrap (decoder_decode_
    # step / kernels/shard.py), where this trace is a per-device program
    from ..kernels.shard import force_interpret, kernel_backend_ok

    interp = force_interpret()
    on_tpu_q4 = kernel_backend_ok() and pallas_single_device_ok()
    # Pallas grouped decode attention streams the layer's cache tiles
    # straight from the STACKED buffer (scalar-prefetch layer index — the
    # dynamic_index slice the einsum path reads through can cost a copy)
    # with the masked softmax fused in VMEM (kernels/decode_attention.py)
    from ..kernels.decode_attention import (
        decode_attention_stacked, supports_decode_attention,
    )

    import os

    if prefix_kv is not None and prefix_bias is None:
        raise ValueError("prefix_kv requires prefix_bias")
    # the prefix-aware Pallas kernels land with the dedup serving path;
    # until then prefix_kv routes every branch to its XLA fallback
    use_pallas_attn = (on_tpu_q4 and layout == "bktd"
                       and prefix_kv is None
                       and not os.environ.get("P2T_NO_PALLAS_DECODE_ATTN")
                       and supports_decode_attention(cfg, ck_all.shape,
                                                     ck_all.dtype))
    kv_mask01 = (bias_o[:, 0, 0, :] >= -1e30).astype(jnp.int32)  # (B, T)
    B_ = B

    def _pfx_cat(li, ck, cv, sk=None, sv=None, bias_full=None):
        """Prepend the layer's batch-broadcast prefix columns to the cache
        operands + bias — one concatenated einsum keeps the reduction
        identical to a prefix physically seeded into the cache."""
        pk = jax.lax.dynamic_index_in_dim(prefix_kv["k"], li, 0,
                                          keepdims=False)
        pv = jax.lax.dynamic_index_in_dim(prefix_kv["v"], li, 0,
                                          keepdims=False)
        if layout == "bktd":                   # (1, Hkv, Pc, D) → batch cat
            Pc = pk.shape[2]
            ck = jnp.concatenate(
                [jnp.broadcast_to(pk.astype(ck.dtype),
                                  (B_,) + pk.shape[1:]), ck], axis=2)
            cv = jnp.concatenate(
                [jnp.broadcast_to(pv.astype(cv.dtype),
                                  (B_,) + pv.shape[1:]), cv], axis=2)
        else:                                  # (Pc, 1, Hkv, D) seq-leading
            Pc = pk.shape[0]
            ck = jnp.concatenate(
                [jnp.broadcast_to(pk.astype(ck.dtype),
                                  (Pc, B_) + pk.shape[2:]), ck], axis=0)
            cv = jnp.concatenate(
                [jnp.broadcast_to(pv.astype(cv.dtype),
                                  (Pc, B_) + pv.shape[2:]), cv], axis=0)
        out = [ck, cv]
        if sk is not None:
            psk = jax.lax.dynamic_index_in_dim(prefix_kv["k_scale"], li, 0,
                                               keepdims=False)
            psv = jax.lax.dynamic_index_in_dim(prefix_kv["v_scale"], li, 0,
                                               keepdims=False)
            out.append(jnp.concatenate(
                [jnp.broadcast_to(psk, (B_,) + psk.shape[1:]), sk], axis=2))
            out.append(jnp.concatenate(
                [jnp.broadcast_to(psv, (B_,) + psv.shape[1:]), sv], axis=2))
        out.append(jnp.concatenate(
            [jnp.broadcast_to(prefix_bias.astype(jnp.float32),
                              (B_, 1, 1, Pc)), bias_full], axis=-1))
        return out

    fetch = _fetch_layer

    def proj(name, li, x_):
        return _stacked_proj(layers, name, li, x_, on_tpu_q4,
                             interpret=interp)

    def qkv(x, li):
        xn = rms_norm(fetch(layers["input_ln"], li), x, cfg.rms_norm_eps)
        q = proj("q_proj", li, xn).reshape(B, H, D)
        k = proj("k_proj", li, xn).reshape(B, Hkv, D)
        v = proj("v_proj", li, xn).reshape(B, Hkv, D)
        if cfg.qk_norm:
            q = rms_norm(fetch(layers["q_norm"], li), q, cfg.rms_norm_eps)
            k = rms_norm(fetch(layers["k_norm"], li), k, cfg.rms_norm_eps)
        q = apply_rope(q[:, :, None, :], cos, sin).reshape(B, H, D)
        k = apply_rope(k.reshape(B, Hkv, 1, D), cos, sin).reshape(B, Hkv, D)
        q = (q.astype(jnp.float32) * scaling).astype(q.dtype)
        return q.reshape(B, Hkv, rep, D), k, v

    def post_attn(x, a, li):
        a = a.reshape(B, 1, H * D)
        o = proj("o_proj", li, a)
        if tp_axis:                     # row-parallel partial sums
            o = jax.lax.psum(o, tp_axis)
        x = x + o
        xn = rms_norm(fetch(layers["post_attn_ln"], li), x, cfg.rms_norm_eps)
        gate = jax.nn.silu(proj("gate_proj", li, xn).astype(jnp.float32))
        up = proj("up_proj", li, xn).astype(jnp.float32)
        d = proj("down_proj", li, (gate * up).astype(xn.dtype))
        if tp_axis:
            d = jax.lax.psum(d, tp_axis)
        return x + d

    # -- int8 KV cache (infer/kvcache.init_kv_cache(kv_bits=8)) -------------
    # The cache stores int8 values + per-(head, token) fp32 scales; the
    # decode-attention cache read is the measured single-chip bandwidth
    # floor, so halving its bytes is the remaining throughput lever.  On
    # TPU the whole layer step runs the fused dequant-attention +
    # quantized-slot-write kernel (kernels/decode_attention.py
    # decode_attention_stacked_write_q, aliased in-place cache + scale
    # updates — XLA refuses in-place updates of while-carried buffers).
    # Off-TPU (and for ineligible shapes) an XLA fallback dequantizes per
    # layer and writes through the same scatter paths as bf16.
    quantized = "k_scale" in kv_cache
    if quantized:
        from .quant import quantize_kv

        sk_all = kv_cache["k_scale"]
        sv_all = kv_cache["v_scale"]
        from ..kernels.decode_attention import (
            decode_attention_stacked_write_q, supports_decode_attention_q,
        )

        if prefix_kv is None:
            use_pallas_q = (
                on_tpu_q4 and layout == "bktd"
                and not os.environ.get("P2T_NO_PALLAS_DECODE_ATTN")
                and supports_decode_attention_q(cfg, ck_all.shape))
        else:
            from ..kernels.decode_attention import (
                decode_attention_stacked_write_q_prefix,
                supports_decode_attention_q_prefix,
            )

            use_pallas_q = (
                on_tpu_q4 and layout == "bktd"
                and not os.environ.get("P2T_NO_PALLAS_DECODE_ATTN")
                and "k_scale" in prefix_kv
                and supports_decode_attention_q_prefix(
                    cfg, ck_all.shape, prefix_kv["k"].shape[3]))
        if use_pallas_q:
            slots = jnp.asarray(cache_index, jnp.int32)
            if prefix_kv is not None:
                pmask01 = (prefix_bias[:, 0, 0, :] >= -1e30
                           ).astype(jnp.int32)         # (B, Pc)

            def block_fused_q(carry, li):
                x, ck_a, cv_a, sk_a, sv_a = carry
                qg, k, v = qkv(x, li)
                kq, ks = quantize_kv(k)
                vq, vs = quantize_kv(v)
                if prefix_kv is not None:
                    a, ck_a, cv_a, sk_a, sv_a = (
                        decode_attention_stacked_write_q_prefix(
                            qg, ck_a, cv_a, sk_a, sv_a, kv_mask01,
                            kq, vq, ks, vs, li, slots,
                            prefix_kv["k"], prefix_kv["v"],
                            prefix_kv["k_scale"], prefix_kv["v_scale"],
                            pmask01, interpret=interp))
                else:
                    a, ck_a, cv_a, sk_a, sv_a = (
                        decode_attention_stacked_write_q(
                            qg, ck_a, cv_a, sk_a, sv_a, kv_mask01,
                            kq, vq, ks, vs, li, slots, interpret=interp))
                return (post_attn(x, a.astype(x.dtype), li),
                        ck_a, cv_a, sk_a, sv_a), None

            (h, ck_all, cv_all, sk_all, sv_all), _ = jax.lax.scan(
                block_fused_q, (token_embeds, ck_all, cv_all, sk_all, sv_all),
                jnp.arange(L))
            h = rms_norm(params["final_ln"], h, cfg.rms_norm_eps)
            return h, {"k": ck_all, "v": cv_all,
                       "k_scale": sk_all, "v_scale": sv_all}

        def block_q(x, li):
            qg, k, v = qkv(x, li)
            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            ck = jax.lax.dynamic_index_in_dim(ck_all, li, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cv_all, li, 0, keepdims=False)
            sk = jax.lax.dynamic_index_in_dim(sk_all, li, 0, keepdims=False)
            sv = jax.lax.dynamic_index_in_dim(sv_all, li, 0, keepdims=False)
            bias_full = bias_o
            if prefix_kv is not None:
                ck, cv, sk, sv, bias_full = _pfx_cat(li, ck, cv, sk, sv,
                                                     bias_full)
            Tc = ck.shape[2]
            # same numerics as the fused kernel: bf16 q·Kᵀ_int → fp32, then
            # the per-column scale; value side folds v_scale into the
            # softmax weights before the ·V matmul
            logits_old = jnp.einsum(
                "bkrd,bktd->bkrt", qg, ck.astype(qg.dtype),
                preferred_element_type=jnp.float32
            ) * sk[:, :, None, :] + bias_full
            knf = kq * ks[..., None]                     # (B, Hkv, D) f32
            logit_new = jnp.einsum(
                "bkrd,bkd->bkr", qg.astype(jnp.float32), knf,
                preferred_element_type=jnp.float32)[..., None]
            logits = jnp.concatenate([logits_old, logit_new], axis=-1)
            w = jax.nn.softmax(logits, axis=-1)
            w_old = (w[..., :Tc] * sv[:, :, None, :]).astype(qg.dtype)
            a = jnp.einsum("bkrt,bktd->bkrd", w_old, cv.astype(qg.dtype),
                           preferred_element_type=jnp.float32)
            vnf = vq * vs[..., None]
            a = a + w[..., Tc:] * vnf[:, :, None, :]
            x = post_attn(x, a.astype(x.dtype), li)
            return x, (kq.astype(jnp.int8), vq.astype(jnp.int8),
                       ks.astype(jnp.float32), vs.astype(jnp.float32))

        h, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            block_q, token_embeds, jnp.arange(L))
        if getattr(cache_index, "ndim", 0) == 1:
            bidx = jnp.arange(B)
            ck_all = ck_all.at[:, bidx, :, cache_index, :].set(
                jnp.moveaxis(k_new, 1, 0))
            cv_all = cv_all.at[:, bidx, :, cache_index, :].set(
                jnp.moveaxis(v_new, 1, 0))
            sk_all = sk_all.at[:, bidx, :, cache_index].set(
                jnp.moveaxis(ks_new, 1, 0))
            sv_all = sv_all.at[:, bidx, :, cache_index].set(
                jnp.moveaxis(vs_new, 1, 0))
        else:
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k_new[:, :, :, None], (0, 0, 0, cache_index, 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v_new[:, :, :, None], (0, 0, 0, cache_index, 0))
            sk_all = jax.lax.dynamic_update_slice(
                sk_all, ks_new[:, :, :, None], (0, 0, 0, cache_index))
            sv_all = jax.lax.dynamic_update_slice(
                sv_all, vs_new[:, :, :, None], (0, 0, 0, cache_index))
        h = rms_norm(params["final_ln"], h, cfg.rms_norm_eps)
        return h, {"k": ck_all, "v": cv_all,
                   "k_scale": sk_all, "v_scale": sv_all}

    # Fused attention + slot write (kernels/decode_attention.py
    # decode_attention_stacked_write): the attention kernel already holds
    # the layer's full cache tile in VMEM, so the new slot's (8, D) tile
    # group is written back through an aliased output — the standalone
    # write's read half (and its dispatches) disappear.  The cache rides
    # in the scan CARRY; the per-layer aliased writes keep it in place.
    # MEASURED dispatch policy (8B int8, scripts/bench_decode_fused.py +
    # bench_decode_perrow.py, identical outputs in both):
    #   * scalar slots (lockstep generate): fusion LOSES — the carried
    #     cache costs more than the RMW write saves (18.76 vs 18.61
    #     ms/step at B=128; 11.63 vs 11.30 at B=16) → split is default,
    #     P2T_FUSED_CACHE_WRITE=1 opts in.
    #   * per-row slots (continuous-batching serving): fusion WINS 1.75x
    #     (13.98 vs 24.52 ms/step at B=8, T=1728) — the XLA batched
    #     scatter `.at[:, bidx, :, idx, :].set` copies the whole cache —
    #     → fused is default, P2T_NO_FUSED_CACHE_WRITE=1 opts out.
    per_row_slots = getattr(cache_index, "ndim", 0) == 1
    write_policy = (bool(os.environ.get("P2T_FUSED_CACHE_WRITE"))
                    or (per_row_slots
                        and not os.environ.get("P2T_NO_FUSED_CACHE_WRITE")))
    if prefix_kv is not None:
        from ..kernels.decode_attention import (
            decode_attention_stacked_write_prefix,
            supports_decode_attention_write_prefix,
        )

        use_fused_write = (
            on_tpu_q4 and layout == "bktd" and write_policy
            and "k_scale" not in prefix_kv
            and not os.environ.get("P2T_NO_PALLAS_DECODE_ATTN")
            and supports_decode_attention_write_prefix(
                cfg, ck_all.shape, prefix_kv["k"].shape[3], ck_all.dtype))
    else:
        use_fused_write = (use_pallas_attn
                           and ck_all.shape[3] % 16 == 0  # bf16 tile groups
                           and write_policy)
    if use_fused_write:
        from ..kernels.decode_attention import decode_attention_stacked_write

        slots = jnp.asarray(cache_index, jnp.int32)
        if prefix_kv is not None:
            pmask01 = (prefix_bias[:, 0, 0, :] >= -1e30
                       ).astype(jnp.int32)               # (B, Pc)

        def block_fused(carry, li):
            x, ck_a, cv_a = carry
            qg, k, v = qkv(x, li)
            if prefix_kv is not None:
                a, ck_a, cv_a = decode_attention_stacked_write_prefix(
                    qg, ck_a, cv_a, kv_mask01, k.astype(qg.dtype),
                    v.astype(qg.dtype), li, slots,
                    prefix_kv["k"], prefix_kv["v"], pmask01,
                    interpret=interp)
            else:
                a, ck_a, cv_a = decode_attention_stacked_write(
                    qg, ck_a, cv_a, kv_mask01, k.astype(qg.dtype),
                    v.astype(qg.dtype), li, slots, interpret=interp)
            return (post_attn(x, a.astype(x.dtype), li), ck_a, cv_a), None

        (h, ck_all, cv_all), _ = jax.lax.scan(
            block_fused, (token_embeds, ck_all, cv_all), jnp.arange(L))
        h = rms_norm(params["final_ln"], h, cfg.rms_norm_eps)
        return h, {"k": ck_all, "v": cv_all}

    def block(x, li):
        qg, k, v = qkv(x, li)

        if use_pallas_attn:
            a = decode_attention_stacked(
                qg, ck_all, cv_all, kv_mask01, k.astype(qg.dtype),
                v.astype(qg.dtype), li,
                interpret=interp).astype(x.dtype)
        else:
            ck = jax.lax.dynamic_index_in_dim(ck_all, li, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(cv_all, li, 0, keepdims=False)
            bias_full = bias_o
            if prefix_kv is not None:
                ck, cv, bias_full = _pfx_cat(li, ck, cv,
                                             bias_full=bias_full)
            Tc = ck.shape[2] if layout == "bktd" else ck.shape[0]
            # grouped-head attention over the stale cache + the current
            # token — einsum subscripts follow the layout so no operand
            # transposes are ever materialized
            ck_sub = "bktd" if layout == "bktd" else "tbkd"
            logits_old = jnp.einsum(
                f"bkrd,{ck_sub}->bkrt", qg, ck,
                preferred_element_type=jnp.float32) + bias_full
            logit_new = jnp.einsum(
                "bkrd,bkd->bkr", qg, k.astype(qg.dtype),
                preferred_element_type=jnp.float32)[..., None]
            logits = jnp.concatenate([logits_old, logit_new], axis=-1)
            w = jax.nn.softmax(logits, axis=-1)
            w_old = w[..., :Tc].astype(cv.dtype)
            w_new = w[..., Tc:].astype(v.dtype)
            a = jnp.einsum(f"bkrt,{ck_sub}->bkrd", w_old, cv,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)
            a = a + (w_new * v[:, :, None, :].astype(w_new.dtype)
                     ).astype(x.dtype)
        x = post_attn(x, a, li)
        # cache stays READ-ONLY inside the scan; new kv returned as ys and
        # written with ONE small dynamic_update_slice below — keeping the
        # cache out of scan carries/ys is what lets XLA update it in place
        return x, (k.astype(ck_all.dtype), v.astype(cv_all.dtype))

    h, (k_new, v_new) = jax.lax.scan(block, token_embeds, jnp.arange(L))
    # k_new/v_new: (L, B, Hkv, D) → one slot write per step.  XLA refuses to
    # update the while-carried cache in place through a plain
    # dynamic_update_slice (full-cache copy per step, profiler-verified in
    # BOTH layouts), so on TPU the writes are Pallas kernels with
    # input_output_aliases (kernels/cache_update.py): a tile-group
    # read-modify-write for "bktd", the slot-slab DMA for "tbkd".
    from ..kernels.cache_update import (
        cache_slot_write, cache_slot_write_bkt, supports_inplace,
        supports_inplace_bkt,
    )

    on_tpu = kernel_backend_ok() and pallas_single_device_ok()
    if getattr(cache_index, "ndim", 0) == 1:
        # per-row slots (continuous batching): one scatter over the batch
        # dim — in place when the serving state buffer is donated across
        # the step jit boundary (infer/serving.py)
        bidx = jnp.arange(B)
        if layout == "bktd":
            ck_all = ck_all.at[:, bidx, :, cache_index, :].set(
                jnp.moveaxis(k_new.astype(ck_all.dtype), 1, 0))
            cv_all = cv_all.at[:, bidx, :, cache_index, :].set(
                jnp.moveaxis(v_new.astype(cv_all.dtype), 1, 0))
        else:
            ck_all = ck_all.at[:, cache_index, bidx, :, :].set(
                k_new.astype(ck_all.dtype))
            cv_all = cv_all.at[:, cache_index, bidx, :, :].set(
                v_new.astype(cv_all.dtype))
        h = rms_norm(params["final_ln"], h, cfg.rms_norm_eps)
        return h, {"k": ck_all, "v": cv_all}
    if layout == "bktd":
        if on_tpu and supports_inplace_bkt(ck_all.shape):
            ck_all = cache_slot_write_bkt(ck_all, k_new, cache_index,
                                          interpret=interp)
            cv_all = cache_slot_write_bkt(cv_all, v_new, cache_index,
                                          interpret=interp)
        else:
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k_new[:, :, :, None], (0, 0, 0, cache_index, 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v_new[:, :, :, None], (0, 0, 0, cache_index, 0))
    else:
        if on_tpu and supports_inplace(ck_all.shape):
            ck_all = cache_slot_write(ck_all, k_new, cache_index,
                                      interpret=interp)
            cv_all = cache_slot_write(cv_all, v_new, cache_index,
                                      interpret=interp)
        else:
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k_new[:, None], (0, cache_index, 0, 0, 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v_new[:, None], (0, cache_index, 0, 0, 0))
    h = rms_norm(params["final_ln"], h, cfg.rms_norm_eps)
    return h, {"k": ck_all, "v": cv_all}


def supports_verify_chunk_step(cfg, kv_cache, G: int,
                               prefix_cols: int = 0, params=None) -> bool:
    """Eligibility for the fused chunk-verify path (decoder_verify_chunk):
    int8 bktd cache, per-device TPU dispatch (single device, inside a
    shard_map, batch-shardable over a dp/fsdp-only mesh, or manual-TP
    shardable when `params` is provided for the format check — the step
    wraps itself, kernels/shard.py), kernel working set in VMEM.
    prefix_cols > 0 checks the shared-prefix (dedup) kernel variant."""
    import os

    from ..kernels.attention import pallas_single_device_ok
    from ..kernels.decode_attention import (
        supports_verify_chunk, supports_verify_chunk_prefix,
    )
    from ..kernels.shard import (
        batch_shard_ctx, kernel_backend_ok, tp_batch_shard_ctx,
    )

    B = kv_cache["k"].shape[1]
    ctx = tctx = None
    if not pallas_single_device_ok():
        ctx = batch_shard_ctx(B)
        if ctx is None:
            tctx = tp_batch_shard_ctx(B, cfg.num_kv_heads, cfg.num_heads)
            if tctx is not None and (
                    params is None
                    or _tp_param_specs(params, tctx[2],
                                       _tp_ntp(tctx)) is None):
                tctx = None    # wrapper would fall back to plain impl
    if not (kernel_backend_ok()
            and (pallas_single_device_ok() or ctx is not None
                 or tctx is not None)
            and not os.environ.get("P2T_NO_PALLAS_DECODE_ATTN")
            and kv_cache_layout(cfg) == "bktd"
            and "k_scale" in kv_cache):
        return False
    if ctx is not None or tctx is not None:
        # the VMEM checks below must see the PER-SHARD slice
        mesh, axes = (ctx if ctx is not None else tctx[:2])
        shape = dict(mesh.shape)
        n = 1
        for a in axes:
            n *= shape[a]
        # tp axis size via the name carried in tctx (advisor r4 — do not
        # hardcode the axis string)
        ntp = shape.get(tctx[2], 1) if tctx is not None else 1
        shp = kv_cache["k"].shape
        kv_cache = {"k": jax.ShapeDtypeStruct(
            (shp[0], shp[1] // n, shp[2] // ntp) + shp[3:],
            kv_cache["k"].dtype)}
    if prefix_cols:
        return supports_verify_chunk_prefix(cfg, kv_cache["k"].shape, G,
                                            prefix_cols)
    return supports_verify_chunk(cfg, kv_cache["k"].shape, G)


def decoder_verify_chunk(
    cfg: DecoderConfig,
    params,
    *,
    token_embeds,
    kv_mask01,
    positions,
    kv_cache,
    cache_index,
    prefix_kv=None,
    prefix_bias=None,
):
    """Fused G-token chunk-verify step (see `_decoder_verify_chunk_impl`).
    On a >1-device batch-axes-only ambient mesh the body is shard_map'd
    over (dp, fsdp) exactly like `decoder_decode_step`, so the fused
    verify kernel keeps running per device (kernels/shard.py)."""
    from ..kernels.shard import (
        batch_dim_spec, batch_shard_ctx, tp_batch_shard_ctx,
    )

    ctx = batch_shard_ctx(token_embeds.shape[0])
    tctx = param_specs = None
    if ctx is None:
        tctx = tp_batch_shard_ctx(token_embeds.shape[0], cfg.num_kv_heads,
                                  cfg.num_heads)
        if tctx is not None:
            param_specs = _tp_param_specs(params, tctx[2], _tp_ntp(tctx))
    if ctx is None and param_specs is None:
        from ..kernels.attention import pallas_single_device_ok

        if not pallas_single_device_ok():
            # the impl is kernel-only (no XLA fallback): dispatching its
            # plain pallas_calls under a >1-device GSPMD mesh would be
            # wrong.  Callers must gate with supports_verify_chunk_step
            # under the SAME ambient mesh (the serving engine re-checks
            # at run()).
            raise RuntimeError(
                "decoder_verify_chunk: ambient multi-device mesh is "
                "neither batch- nor tp-shardable for this config; gate "
                "with supports_verify_chunk_step under the same mesh")
        return _decoder_verify_chunk_impl(
            cfg, params, token_embeds=token_embeds, kv_mask01=kv_mask01,
            positions=positions, kv_cache=kv_cache, cache_index=cache_index,
            prefix_kv=prefix_kv, prefix_bias=prefix_bias)
    if ctx is not None:
        mesh, axes = ctx
        tp_axis, pspec, prefix_spec, run_cfg = None, P(), P(), cfg
        cache_spec = batch_dim_spec(axes, 1)  # int8 bktd only (gated)
    else:
        mesh, axes, tp_axis = tctx
        pspec = param_specs
        prefix_spec = (P(None, None, tp_axis) if prefix_kv is not None
                       else P())
        run_cfg = _tp_local_cfg(cfg, dict(mesh.shape)[tp_axis])
        cache_spec = P(None, axes or None, tp_axis)
    bspec = batch_dim_spec(axes, 0) if axes else P()

    def body(params_, token_embeds_, kv_mask01_, positions_, kv_cache_,
             cache_index_, prefix_kv_, prefix_bias_):
        if tp_axis is not None:
            params_ = _strip_tp_keys(params_, _tp_ntp(tctx))
        return _decoder_verify_chunk_impl(
            run_cfg, params_, token_embeds=token_embeds_,
            kv_mask01=kv_mask01_, positions=positions_, kv_cache=kv_cache_,
            cache_index=cache_index_, prefix_kv=prefix_kv_,
            prefix_bias=prefix_bias_, tp_axis=tp_axis)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, bspec, bspec, bspec, cache_spec, bspec,
                  prefix_spec,
                  P() if prefix_bias is None else bspec),
        out_specs=(bspec, cache_spec),
        check_vma=False,  # pallas_call inside needs the checker off
    )(params, token_embeds, kv_mask01, positions, kv_cache, cache_index,
      prefix_kv, prefix_bias)


def _decoder_verify_chunk_impl(
    cfg: DecoderConfig,
    params,
    *,
    token_embeds,        # (B, G, H) — the speculative chunk's embeddings
    kv_mask01,           # (B, T) 0/1 over ALREADY-WRITTEN cache slots
    positions,           # (B, G) rope positions of the chunk tokens
    kv_cache,            # int8 KV: {"k","v","k_scale","v_scale"} bktd
    cache_index,         # (B,) int32 per-row chunk-start columns, <= T-64
    prefix_kv=None,      # optional batch-broadcast shared-prefix int8 KV
                         # (L, 1, Hkv, Pc, D) + scales (serving dedup)
    prefix_bias=None,    # fp32 (B, 1, 1, Pc) additive over prefix columns
    tp_axis=None,        # manual-TP psum axis (see decoder_decode_step)
):
    """Fused G-token chunk-verify step for speculative serving
    (infer/serving._spec_rounds): the chunk generalization of
    decoder_decode_step's fused int8 path.  Per layer, ONE Pallas kernel
    (kernels/decode_attention.decode_attention_stacked_verify_qc) streams
    the layer's int8 cache tiles once, runs [stale-cache ‖ intra-chunk
    causal] fp32 softmax attention for all G·rep query rows, and writes
    the chunk's G consecutive slots in place through aliased outputs —
    none of the generic decoder_forward path's per-layer cache dequant
    materialization or full-cache scan-ys rewrites.  Callers gate on
    supports_verify_chunk_step.  Returns (h (B, G, Hid), new_cache)."""
    from .quant import quantize_kv
    from ..kernels.decode_attention import (
        decode_attention_stacked_verify_qc,
        decode_attention_stacked_verify_qc_prefix,
    )
    from ..kernels.shard import force_interpret

    interp = force_interpret()

    B, G, _ = token_embeds.shape
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = H // Hkv
    L = cfg.num_layers
    cos, sin = decoder_rope_cos_sin(cfg, positions)   # (B, G, D)
    scaling = D ** -0.5
    layers = params["layers"]
    slots = jnp.asarray(cache_index, jnp.int32)
    kv_mask01 = kv_mask01.astype(jnp.int32)

    def proj(name, li, x_):
        return _stacked_proj(layers, name, li, x_, True, interpret=interp)

    def qkv(x, li):
        xn = rms_norm(_fetch_layer(layers["input_ln"], li), x,
                      cfg.rms_norm_eps)
        q = proj("q_proj", li, xn).reshape(B, G, H, D)
        k = proj("k_proj", li, xn).reshape(B, G, Hkv, D)
        v = proj("v_proj", li, xn).reshape(B, G, Hkv, D)
        if cfg.qk_norm:
            q = rms_norm(_fetch_layer(layers["q_norm"], li), q,
                         cfg.rms_norm_eps)
            k = rms_norm(_fetch_layer(layers["k_norm"], li), k,
                         cfg.rms_norm_eps)
        q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)   # (B, H, G, D)
        k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)   # (B, Hkv, G, D)
        q = (q.astype(jnp.float32) * scaling).astype(q.dtype)
        # kernel row order g·rep + r: (B, H, G, D) → (B, Hkv, G·rep, D)
        q = q.reshape(B, Hkv, rep, G, D).transpose(0, 1, 3, 2, 4)
        q = q.reshape(B, Hkv, G * rep, D)
        return q, k, v.transpose(0, 2, 1, 3)

    def post_attn(x, a, li):
        # (B, Hkv, G·rep, D) → (B, G, H·D)
        a = a.reshape(B, Hkv, G, rep, D).transpose(0, 2, 1, 3, 4)
        a = a.reshape(B, G, H * D)
        o = proj("o_proj", li, a)
        if tp_axis:                     # row-parallel partial sums
            o = jax.lax.psum(o, tp_axis)
        x = x + o
        xn = rms_norm(_fetch_layer(layers["post_attn_ln"], li), x,
                      cfg.rms_norm_eps)
        gate = jax.nn.silu(proj("gate_proj", li, xn).astype(jnp.float32))
        up = proj("up_proj", li, xn).astype(jnp.float32)
        d = proj("down_proj", li, (gate * up).astype(xn.dtype))
        if tp_axis:
            d = jax.lax.psum(d, tp_axis)
        return x + d

    if prefix_kv is not None:
        pmask01 = (prefix_bias[:, 0, 0, :] >= -1e30
                   ).astype(jnp.int32)             # (B, Pc)

    def block(carry, li):
        x, ck_a, cv_a, sk_a, sv_a = carry
        qg, k, v = qkv(x, li)
        kq, ks = quantize_kv(k)                    # (B, Hkv, G, ·)
        vq, vs = quantize_kv(v)
        if prefix_kv is not None:
            a, ck_a, cv_a, sk_a, sv_a = (
                decode_attention_stacked_verify_qc_prefix(
                    qg, ck_a, cv_a, sk_a, sv_a, kv_mask01, kq, vq, ks, vs,
                    li, slots, prefix_kv["k"], prefix_kv["v"],
                    prefix_kv["k_scale"], prefix_kv["v_scale"], pmask01,
                    interpret=interp))
        else:
            a, ck_a, cv_a, sk_a, sv_a = decode_attention_stacked_verify_qc(
                qg, ck_a, cv_a, sk_a, sv_a, kv_mask01, kq, vq, ks, vs,
                li, slots, interpret=interp)
        return (post_attn(x, a.astype(x.dtype), li),
                ck_a, cv_a, sk_a, sv_a), None

    (h, ck, cv, sk, sv), _ = jax.lax.scan(
        block,
        (token_embeds, kv_cache["k"], kv_cache["v"],
         kv_cache["k_scale"], kv_cache["v_scale"]),
        jnp.arange(L))
    h = rms_norm(params["final_ln"], h, cfg.rms_norm_eps)
    return h, {"k": ck, "v": cv, "k_scale": sk, "v_scale": sv}


def decoder_logits(cfg: DecoderConfig, params, hidden_states):
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"].T
    elif "kernel" not in params["lm_head"]:   # quantized (int8/int4) head
        from .transformer import linear

        # int4 heads use Pallas fused dequant-matmuls (transformer.linear)
        # that don't partition under GSPMD — on a batch-axes-only mesh run
        # the head per device over batch shards (kernels/shard.py), same
        # treatment as the decode step.  int8 heads are a plain XLA
        # mixed-dtype dot and need no wrap.
        from ..kernels.shard import batch_shard_ctx, shard_map_over_batch

        quant_head = any(k.startswith("kernel_q4")
                         for k in params["lm_head"])
        ctx = batch_shard_ctx(hidden_states.shape[0]) if quant_head else None
        if ctx is not None:
            return shard_map_over_batch(
                lambda p_, h_: linear(p_, h_).astype(jnp.float32),
                ctx, (params["lm_head"], hidden_states), (None, 0), 0)
        return linear(params["lm_head"], hidden_states).astype(jnp.float32)
    else:
        w = params["lm_head"]["kernel"]
    return jnp.matmul(
        hidden_states, w.astype(hidden_states.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)


def causal_bias_from_mask(attention_mask, dtype=jnp.float32):
    """HF-parity full-sequence causal bias: sequence-index causal AND key
    padding mask. attention_mask: (B, S) 0/1 → (B, 1, S, S) fp32."""
    B, S = attention_mask.shape
    neg = jnp.finfo(dtype).min
    idx = jnp.arange(S)
    causal = idx[None, :] <= idx[:, None]  # (S, S)
    key_ok = attention_mask[:, None, None, :].astype(bool)
    ok = jnp.logical_and(causal[None, None], key_ok)
    return jnp.where(ok, jnp.zeros([], dtype), jnp.full([], neg, dtype))


def cross_entropy_loss(logits, labels, ignore_index: int = -100):
    """Shifted causal LM loss, mean over valid label positions (HF parity:
    logits[:, :-1] vs labels[:, 1:], ignore -100)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    ll = jnp.where(valid, ll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return -(ll.sum() / count)
