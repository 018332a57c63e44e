"""Shared transformer primitives (pure functions over param pytrees).

All norms/softmax accumulate in fp32 regardless of the compute dtype; matmuls
set `preferred_element_type` so the MXU accumulates in fp32. Params are nested
dicts with 'kernel' stored (in_dim, out_dim) — i.e. `y = x @ kernel + bias`.
Layer stacks keep a leading (n_layers, ...) dim and run under `lax.scan` so
XLA compiles ONE layer body (fast compiles, fixed schedule), with optional
`jax.checkpoint` rematerialisation for memory.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels.attention import dot_product_attention

# ---------------------------------------------------------------------------
# basic layers


def _tp_segmented_key(p):
    """kernel_q4*_tp{n} leaf (models/quant.repack_int4_for_tp): each of the
    n contiguous K segments is packed independently so the packed dim
    slices per manual-TP shard.  Returns (key, fmt, ntp) or None."""
    for k in p:
        if k.startswith("kernel_q4") and "_tp" in k:
            fmt, _, n = k.partition("_tp")
            return k, fmt, int(n)
    return None


def linear(p, x, precision=None):
    seg = _tp_segmented_key(p)
    if seg is not None and x.ndim > 2:
        lead = x.shape[:-1]
        y = linear(p, x.reshape(-1, x.shape[-1]), precision=precision)
        return y.reshape(*lead, y.shape[-1])
    if seg is not None:
        # GSPMD / prefill path for a segment-repacked int4 leaf: unpack
        # per segment (the reshape splits exactly on the shard boundary,
        # so GSPMD keeps the unpack local to each tp shard) and run the
        # mixed-precision dot.  Prefill shapes are MXU-bound — the unpack
        # materialization is amortized over the activation rows, same as
        # the plain int4 XLA fallback.  The decode/verify hot paths never
        # come here (models/decoder strips the suffix inside shard_map
        # and dispatches the stacked Pallas kernels).
        from ..kernels.quant_matmul import (
            unpack_int4, unpack_int4_pairs, unpack_int4_planes,
        )

        key, fmt, ntp = seg
        unpack = {"kernel_q4p": unpack_int4_planes,
                  "kernel_q4w": unpack_int4_pairs,
                  "kernel_q4": unpack_int4}[fmt]
        wp = p[key]                                    # (..., K/g, N)
        wl, N = wp.shape[:-2], wp.shape[-1]
        w = unpack(wp.reshape(*wl, ntp, wp.shape[-2] // ntp, N))
        w = w.reshape(*wl, -1, N)                      # (..., K, N) int8
        y = jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (w.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = (y * p["scale"][..., 0, :]).astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y
    if x.ndim > 2 and ("kernel_q" in p or "kernel_q4" in p
                       or "kernel_q4p" in p or "kernel_q4w" in p):
        # Flatten leading dims for the quantized paths: XLA's mixed-dtype
        # dot_general re-streams the ENTIRE weight matrix once per leading
        # slice of a >2D activation (measured 4.30 ms vs 1.50 ms flattened
        # for a (16,5,4096)x(4096,128256) int8 head — exactly 5x, i.e. one
        # 525 MB weight read per G row; scripts/bench_logits3d.py), and the
        # Pallas row-count gates below misjudge 3D shapes the same way.
        lead = x.shape[:-1]
        y = linear(p, x.reshape(-1, x.shape[-1]), precision=precision)
        return y.reshape(*lead, y.shape[-1])
    if "kernel_q4w" in p:
        # int4 bf16-PAIR path (models/quant.py int4_format="pairs"): one
        # shr+and+or+bitcast pass bit-constructs TWO bf16 weights (+136
        # bias removed in the fp32 epilogue) — ~half the plane kernel's
        # VPU unpack work (kernels/quant_matmul.py)
        from ..kernels.quant_matmul import (
            quant_matmul_int4_pairs, quant_matmul_int4_pairs_xla,
            supports_quant_matmul_pairs,
        )

        wp = p["kernel_q4w"]
        scale = p["scale"][..., 0, :]
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        from ..kernels.attention import pallas_single_device_ok

        if (wp.ndim == 2 and rows <= 256
                and jax.default_backend() == "tpu"
                and pallas_single_device_ok()
                and supports_quant_matmul_pairs(wp.shape[0] * 8,
                                                wp.shape[1])):
            lead = x.shape[:-1]
            y = quant_matmul_int4_pairs(
                x.reshape(-1, x.shape[-1]), wp, scale, out_dtype=x.dtype)
            y = y.reshape(*lead, wp.shape[-1])
        else:
            y = quant_matmul_int4_pairs_xla(x, wp, scale, out_dtype=x.dtype)
    elif "kernel_q4p" in p:
        # int4 nibble-PLANE path (models/quant.py int4_format="planes"):
        # i32 words hold 8 k-planes; the kernel loads native i32 tiles
        # (no i8 widening — Mosaic legalizes only i32 vector shifts)
        from ..kernels.quant_matmul import (
            quant_matmul_int4_planes, quant_matmul_int4_planes_xla,
            supports_quant_matmul_planes,
        )

        wp = p["kernel_q4p"]
        scale = p["scale"][..., 0, :]
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        from ..kernels.attention import pallas_single_device_ok

        if (wp.ndim == 2 and rows <= 256
                and jax.default_backend() == "tpu"
                and pallas_single_device_ok()
                and supports_quant_matmul_planes(wp.shape[0] * 8,
                                                 wp.shape[1])):
            lead = x.shape[:-1]
            y = quant_matmul_int4_planes(
                x.reshape(-1, x.shape[-1]), wp, scale, out_dtype=x.dtype)
            y = y.reshape(*lead, wp.shape[-1])
        else:
            y = quant_matmul_int4_planes_xla(x, wp, scale, out_dtype=x.dtype)
    elif "kernel_q4" in p:
        # int4 weight-only path (models/quant.py bits=4): nibble-packed
        # weights stream through the Pallas fused dequant-matmul on TPU —
        # XLA cannot keep the unpack out of HBM (kernels/quant_matmul.py).
        from ..kernels.quant_matmul import (
            quant_matmul_int4, quant_matmul_int4_xla, supports_quant_matmul,
        )

        wp = p["kernel_q4"]
        scale = p["scale"][..., 0, :]
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        # Pallas path is for the weight-streaming-bound serving shapes
        # (few activation rows); the kernel keeps the whole row block in
        # VMEM per tile, so large-R prefill/training calls take the XLA
        # fallback instead (they are MXU-bound — the unpack materialization
        # is amortized over R rows of reuse).
        from ..kernels.attention import pallas_single_device_ok

        if (wp.ndim == 2 and rows <= 256
                and jax.default_backend() == "tpu"
                and pallas_single_device_ok()
                and supports_quant_matmul(wp.shape[0] * 2, wp.shape[1],
                                          bits=4)):
            lead = x.shape[:-1]
            y = quant_matmul_int4(
                x.reshape(-1, x.shape[-1]), wp, scale, out_dtype=x.dtype)
            y = y.reshape(*lead, wp.shape[-1])
        else:
            y = quant_matmul_int4_xla(x, wp, scale, out_dtype=x.dtype)
    elif "kernel_q" in p:
        # int8 weight-only path (models/quant.py): MIXED-DTYPE dot_general
        # (bf16 x int8) lets XLA fuse the dequant into the matmul operand
        # read — an explicit .astype(bf16) materializes converted weights
        # and measured ~6x slower on v5e (the weight stream doubles and
        # round-trips HBM); per-channel scale applies in the fp32 epilogue
        y = jax.lax.dot_general(
            x, p["kernel_q"],
            (((x.ndim - 1,), (p["kernel_q"].ndim - 2,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = (y * p["scale"][..., 0, :]).astype(x.dtype)
    else:
        y = jnp.matmul(x, p["kernel"].astype(x.dtype), precision=precision)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def linear_lora(p, lora, x, scale: float = 1.0):
    """y = x·W (+ bias) + scale·(x·A)·B — the low-rank side path.

    Keeps LoRA training memory at O(r·(din+dout)) instead of materializing
    W+ΔW (merge_lora is only for inference merge-and-unload).  `lora` is
    None (no adaptation) or {"A": (din, r), "B": (r, dout)}."""
    y = linear(p, x)
    if lora is None:
        return y
    xa = jnp.matmul(x, lora["A"].astype(x.dtype))
    delta = jnp.matmul(xa, lora["B"].astype(x.dtype))
    return y + scale * delta


def layer_norm(p, x, eps: float = 1e-5):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(p, x, eps: float = 1e-6):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(dtype)


def gelu_erf(x):
    """Exact-erf GELU (the reference ESM stack requires erf, not tanh —
    see gelu() in HF modeling_esm)."""
    x32 = x.astype(jnp.float32)
    y = x32 * 0.5 * (1.0 + jax.lax.erf(x32 / jnp.sqrt(2.0).astype(jnp.float32)))
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# rotary position embeddings (GPT-NeoX half-split layout, used by ESM2, Llama,
# Qwen3 and ESMC alike)


def rope_cos_sin(positions, head_dim: int, theta: float):
    """positions: (..., seq) int32 → cos/sin (..., seq, head_dim) fp32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., S, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x, cos, sin):
    """x: (B, H, S, D); cos/sin: (B, S, D) or (S, D)."""
    if cos.ndim == 2:
        cos = cos[None, None, :, :]
        sin = sin[None, None, :, :]
    else:
        cos = cos[:, None, :, :]
        sin = sin[:, None, :, :]
    x32 = x.astype(jnp.float32)
    out = x32 * cos + rotate_half(x32) * sin
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# attention


def repeat_kv(x, n_rep: int):
    """(B, Hkv, S, D) → (B, Hkv*n_rep, S, D) for GQA."""
    if n_rep == 1:
        return x
    b, h, s, d = x.shape
    x = jnp.broadcast_to(x[:, :, None], (b, h, n_rep, s, d))
    return x.reshape(b, h * n_rep, s, d)


def make_attention_bias(attention_mask, dtype=jnp.float32, causal: bool = False,
                        q_positions: Optional[jax.Array] = None,
                        kv_positions: Optional[jax.Array] = None):
    """Additive bias (B, 1, Sq, Skv) from a (B, Skv) 0/1 key mask.

    If causal, also needs q/kv absolute positions (B, Sq)/(B, Skv) — entries
    with kv_pos > q_pos are masked. Left-padded prompts work because positions
    are computed from the cumulative attention mask by callers.
    """
    neg = jnp.finfo(dtype).min
    key_ok = attention_mask[:, None, None, :].astype(bool)  # (B,1,1,Skv)
    ok = key_ok
    if causal:
        q = q_positions[:, None, :, None]  # (B,1,Sq,1)
        kv = kv_positions[:, None, None, :]  # (B,1,1,Skv)
        ok = jnp.logical_and(ok, kv <= q)
    return jnp.where(ok, jnp.zeros([], dtype), jnp.full([], neg, dtype))


def attention(q, k, v, bias, impl: str = "xla", lengths=None):
    """q,k,v: (B, H, S, D) with equal H (repeat_kv already applied).
    bias: fp32 additive (B, 1, Sq, Skv) or (B, H, Sq, Skv).
    lengths: optional (kv_start, kv_len, causal) contiguous-mask assertion
    enabling the masked flash kernel under impl="auto"."""
    return dot_product_attention(q, k, v, bias, impl=impl, lengths=lengths)


# ---------------------------------------------------------------------------
# layer scan helper


def scan_layers(body, params_stacked, carry, n_layers: int, remat: bool):
    """Run `body(layer_params, carry) -> carry` over stacked layer params."""
    f = body
    if remat:
        f = jax.checkpoint(f, prevent_cse=False)

    def step(c, lp):
        return f(lp, c), None

    carry, _ = jax.lax.scan(step, carry, params_stacked)
    return carry
