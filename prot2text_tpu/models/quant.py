"""Int8 weight-only quantization for serving.

Covers the reference's `--torch_dtype int8/int4` CLI surface
(scripts/utils_argparse.py:27-48, where bitsandbytes provided the kernels) the
TPU way: per-output-channel symmetric int8 weights with fp32 scales.  Decode
throughput at serving batch sizes is HBM-bandwidth-bound on weight reads —
int8 halves the bytes vs bf16.

`quantize_params` rewrites every targeted kernel leaf {kernel} →
{kernel_q (int8), scale (1, dout) fp32}; `transformer.linear` dequantizes on
the fly (x·q)·scale — XLA fuses the scale multiply into the matmul epilogue.
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
    """(..., din, dout) float → int8/int4 values + per-(…, dout) fp32
    scales (symmetric, per-output-channel)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)   # (..., 1, dout)
    qmax = float(2 ** (bits - 1) - 1)
    scale = jnp.maximum(absmax, 1e-8) / qmax
    store = jnp.int8 if bits == 8 else jnp.int4
    q = jnp.clip(jnp.round(w32 / scale), -qmax, qmax).astype(store)
    return q, scale


def quantize_params(params: Any,
                    target_patterns: Sequence[str] = DEFAULT_TARGETS,
                    bits: int = 8) -> Any:
    """Returns a tree where targeted kernels are {kernel_q, scale} dicts.
    bits=4 stores native jnp.int4 (quarter the bf16 weight bytes)."""
    pats = [re.compile(p) for p in target_patterns]

    def walk(node, prefix):
        if isinstance(node, dict):
            if ("kernel" in node
                    and hasattr(node["kernel"], "ndim")
                    and node["kernel"].ndim >= 2
                    and any(p.search(prefix + "/kernel") for p in pats)):
                q, scale = quantize_leaf(node["kernel"], bits)
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


def quantized_bytes(params: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "dtype"))
