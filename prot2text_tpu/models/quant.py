"""Int8/int4 weight-only quantization for serving.

Covers the reference's `--torch_dtype int8/int4` CLI surface
(scripts/utils_argparse.py:27-48, where bitsandbytes provided the kernels) the
TPU way: per-output-channel symmetric weights with fp32 scales.  Decode
throughput at serving batch sizes is HBM-bandwidth-bound on weight reads —
int8 halves the bytes vs bf16; int4 halves them again.

`quantize_params` rewrites every targeted kernel leaf:
  bits=8 → {kernel_q (int8), scale (..., 1, dout) f32}; `transformer.linear`
           dequantizes on the fly with a MIXED-dtype dot_general (XLA fuses
           the int8→bf16 convert into the matmul operand read).
  bits=4 → {kernel_q4 (din/2, dout) int8, scale}: two nibbles per byte in
           kernels/quant_matmul.pack_int4's split-half order, consumed by
           the Pallas streaming kernel `quant_matmul_int4` on TPU (XLA has
           no fused int4 path — an XLA-level unpack materializes int8 to
           HBM and loses the entire win; measured in
           scripts/bench_quant_matmul.py).  Quarter the bf16 bytes: the
           capacity lever that fits 14B-class decoders on one 16 GB chip.
Embeddings / norms / biases stay high precision.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = (
    r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj|lm_head)"
    r"/kernel$",
    r"(qkv|out_proj|ffn_in|ffn_out|attn_out|query|key|value|intermediate"
    r"|output)/kernel$",
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def quantize_leaf(w, bits: int = 8):
    """(..., din, dout) float → int values (int8 storage) + per-(…, dout)
    fp32 scales (symmetric, per-output-channel).  bits=4 values live in
    [-7, 7] and are returned UNPACKED (see pack below)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)   # (..., 1, dout)
    qmax = float(2 ** (bits - 1) - 1)
    scale = jnp.maximum(absmax, 1e-8) / qmax
    q = jnp.clip(jnp.round(w32 / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale


def quantize_kv(x, qmax: float = 127.0):
    """Per-vector symmetric int8 quantization over the LAST dim (one scale
    per KV head vector — the granularity the int8 KV cache stores:
    infer/kvcache.init_kv_cache(kv_bits=8)).

    Returns (q, scale): q are EXACT INTEGER VALUES carried in fp32 (callers
    cast to int8 for storage; the Pallas fused decode kernel takes the fp32
    form so the current-token logit and the slot store share one operand),
    scale is fp32 with the last dim dropped.  Dequantization is
    `q * scale[..., None]`."""
    x32 = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1), 1e-8) / qmax
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -qmax, qmax)
    return q, scale


def quantize_params(params: Any,
                    target_patterns: Sequence[str] = DEFAULT_TARGETS,
                    bits: int = 8, int4_format: str = "planes") -> Any:
    """Returns a tree where targeted kernels are {kernel_q, scale} (bits=8)
    or, for bits=4, one of three packings:

    - int4_format="planes" (DEFAULT — exact): {kernel_q4p, scale}, i32
      nibble-plane words (pack_int4_planes).  The kernel loads native i32
      tiles (no i8 widening; Mosaic legalizes only i32 vector shifts) and
      dequantizes EXACTLY — bit-identical outputs to the bytes format and
      the XLA mixed-dtype reference path.  +7% over bytes on the 14B
      one-chip decode (scripts/bench_int4_formats.py).
    - int4_format="pairs" (opt-in, fastest): {kernel_q4w, scale},
      bf16-pair i32 words (pack_int4_pairs).  The kernel bit-CONSTRUCTS
      two bf16 values per shr+and+or+bitcast pass (~1 VPU op/value vs the
      plane kernel's 3) and removes the +136 construction bias with an
      fp32 epilogue subtract of 136*rowsum(x).  +5.2% over planes in-situ
      (15.56 vs 16.38 ms/step at 14B B=16) but NOT exact: the epilogue
      cancellation leaves ~4e-6-of-max absolute error per matmul, which
      measurably drifts hidden states over many layers (greedy tokens can
      differ from the exact formats at near-tie logits) — a documented
      throughput/fidelity tradeoff for serving (kernels/quant_matmul.py).
    - int4_format="bytes": {kernel_q4, scale}, split-half nibble bytes
      (pack_int4) — also the automatic fallback when the contraction dim
      isn't divisible by 8."""
    pats = [re.compile(p) for p in target_patterns]

    def walk(node, prefix):
        if isinstance(node, dict):
            if ("kernel" in node
                    and hasattr(node["kernel"], "ndim")
                    and node["kernel"].ndim >= 2
                    and any(p.search(prefix + "/kernel") for p in pats)):
                q, scale = quantize_leaf(node["kernel"], bits)
                if (bits == 4 and int4_format == "pairs"
                        and q.shape[-2] % 8 == 0):
                    from ..kernels.quant_matmul import pack_int4_pairs

                    new = {"kernel_q4w": pack_int4_pairs(q), "scale": scale}
                elif (bits == 4 and int4_format == "planes"
                        and q.shape[-2] % 8 == 0):
                    from ..kernels.quant_matmul import pack_int4_planes

                    new = {"kernel_q4p": pack_int4_planes(q), "scale": scale}
                elif bits == 4 and q.shape[-2] % 2 == 0:
                    from ..kernels.quant_matmul import pack_int4

                    new = {"kernel_q4": pack_int4(q), "scale": scale}
                else:
                    new = {"kernel_q": q, "scale": scale}
                for k, v in node.items():
                    if k != "kernel":
                        new[k] = v
                return new
            return {k: walk(v, f"{prefix}/{k}") for k, v in node.items()}
        return node

    return walk(params, "")


def dequantize_leaf(q, scale, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


# row-parallel projections of the decoder stacks (Megatron manual-TP:
# these shard the INPUT dim; models/decoder._TP_ROW_PROJS mirrors this)
_ROW_PARALLEL = ("o_proj", "down_proj")


def repack_int4_for_tp(params: Any, ntp: int,
                       row_parallel: Sequence[str] = _ROW_PARALLEL,
                       layer_chunk: int = 8) -> Any:
    """Segment-repack ROW-PARALLEL int4 kernels for an ntp-way manual-TP
    mesh (VERDICT r4 #3).

    The int4 word packings interleave nibble planes across the WHOLE
    contraction dim (kernels/quant_matmul.pack_int4_planes: nibble j of
    word k8 holds row k8 + j*K/8; pack_int4: split halves), so slicing the
    packed K/8 (or K/2) dim per tp shard does NOT yield that shard's
    weights — which is why int4 previously fell back to GSPMD under tp
    meshes.  Repacking each contiguous K/ntp segment independently makes
    the packed dim sliceable: shard s's packed rows
    [s*(K/8)/ntp, (s+1)*(K/8)/ntp) are exactly its locally-packed local
    weights, and inside the shard the unchanged stacked Pallas kernels
    consume them as a normal (L, K_local/8, N) buffer.

    The repacked leaf is RENAMED kernel_q4p → kernel_q4p_tp{ntp} (same for
    q4w/q4): globally the array is segment-packed and is NOT a valid
    operand for the single-device/GSPMD paths — the renamed key makes any
    such use fail loudly instead of silently dequantizing garbage.
    models/decoder strips the suffix inside the manual-TP shard_map body.
    Column-parallel projections slice the OUTPUT dim, which commutes with
    every packing — untouched.  Segment boundaries coincide with the
    head/ffn shard boundaries because head outputs are laid out
    contiguously along K."""
    from ..kernels.quant_matmul import (
        pack_int4, pack_int4_pairs, pack_int4_planes, unpack_int4,
        unpack_int4_pairs, unpack_int4_planes,
    )

    fmts = {
        "kernel_q4p": (unpack_int4_planes, pack_int4_planes, 8),
        "kernel_q4w": (unpack_int4_pairs, pack_int4_pairs, 8),
        "kernel_q4": (unpack_int4, pack_int4, 2),
    }
    layers = dict(params["layers"])
    for name in row_parallel:
        sub = layers.get(name)
        if not isinstance(sub, dict):
            continue
        key = next((k for k in fmts if k in sub), None)
        if key is None:
            continue
        unpack, pack, group = fmts[key]
        wp = sub[key]                                   # (L, K/g, N)
        K = wp.shape[-2] * group
        if K % (ntp * 8):
            raise ValueError(
                f"repack_int4_for_tp: {name} K={K} not divisible by "
                f"ntp*8={ntp * 8}")
        Kn = K // ntp

        @jax.jit
        def reseg(w):
            q = unpack(w)                               # (c, K, N) int8
            q = q.reshape(q.shape[0], ntp, Kn, q.shape[-1])
            return pack(q).reshape(w.shape)

        # chunk over layers to bound the int8 unpack transient (~2 bytes/
        # weight per chunk instead of the whole stack)
        new = jnp.concatenate(
            [reseg(wp[i:i + layer_chunk])
             for i in range(0, wp.shape[0], layer_chunk)], axis=0)
        layers[name] = {
            (f"{key}_tp{ntp}" if k == key else k): (new if k == key else v)
            for k, v in sub.items()}
    return {**params, "layers": layers}


def quantized_bytes(params: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "dtype"))
