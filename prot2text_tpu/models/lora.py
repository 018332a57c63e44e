"""LoRA as separate parameter trees merged at apply time.

TPU-native equivalent of the reference's PEFT wrapper (train_instruct.py:
146-183): LoRA r=32, alpha=2r, targets q/k/v/o + gate/up/down on the LLM and
layernorm_qkv.1 (= fused qkv), out_proj, ffn.1/ffn.3 on ESMC, with the
modality adapter's fc1/fc2 fully trainable ("modules_to_save").

Representation: for every targeted kernel leaf (path ending in
`<target>/kernel`, shape (..., din, dout) — stacked layers keep their leading
L dim) we store A: (..., din, r) and B: (..., r, dout), B zero-initialized so
the initial model equals the base (PEFT parity).  `merge_lora` materializes
W + (alpha/r)·A@B — used both for the train step (gradients flow into A/B
through the merge; XLA fuses the batched delta matmul) and for
merge-and-unload at inference (reference generate_instruct.py:190-191).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 32
    alpha: int = 64           # reference: lora_alpha = 2 * r
    # regexes over tree paths (joined with '/').  Quantized kernels are
    # valid LoRA bases — the side path trains in bf16 over the frozen
    # quantized matmul (QLoRA-style): kernel_q (int8), kernel_q4p/q4w
    # (int4 i32-word packings, K = shape[-2]*8) and kernel_q4 (split-half
    # nibble bytes, K = shape[-2]*2).  The packed leading dims only matter
    # for A's init shape (unpacked K); apply-time needs nothing special
    # since linear_lora adds the side path AFTER the quantized matmul.
    # A 14B int4 frozen base (7.4 GB) is what fits QLoRA on one 16 GB chip
    # (reference stage-2 scale, train_instruct.py:87-94).
    target_patterns: Sequence[str] = (
        r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)"
        r"/kernel(_q|_q4|_q4p|_q4w)?$",
        r"(qkv|out_proj|ffn_in|ffn_out)/kernel(_q|_q4|_q4p|_q4w)?$",
    )

    @property
    def scale(self) -> float:
        return self.alpha / self.r


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


def _is_target(cfg: LoraConfig, path: str) -> bool:
    return any(re.search(p, path) for p in cfg.target_patterns)


# kernel-leaf keys a lora subtree may mirror, most-specific first (plain
# dict.get chains would mis-resolve "kernel_q4" before "kernel_q4p")
_KERNEL_KEYS = ("kernel", "kernel_q", "kernel_q4p", "kernel_q4w",
                "kernel_q4")


def lora_at(sub) -> Any:
    """The {"A","B"} dict at a (possibly quantized) linear's kernel leaf of
    a LoRA subtree, or None.  `sub` mirrors the param dict structure, e.g.
    {"kernel_q4p": {"A":..., "B":...}, "scale": None}."""
    if not isinstance(sub, dict):
        return None
    for k in _KERNEL_KEYS:
        v = sub.get(k)
        if v is not None:
            return v
    return None


def _unpacked_in_dim(path: str, shape) -> int:
    """True contraction dim K of a possibly-packed kernel leaf (models/
    quant.py packings: q4p/q4w i32 words hold 8 k-planes, q4 bytes hold 2
    nibbles)."""
    k = shape[-2]
    if path.endswith("kernel_q4p") or path.endswith("kernel_q4w"):
        return k * 8
    if path.endswith("kernel_q4"):
        return k * 2
    return k


def init_lora_params(cfg: LoraConfig, base_params: Any, key,
                     dtype=jnp.float32):
    """Returns a tree with the SAME structure as base_params but containing
    {"A","B"} dicts at targeted kernel leaves and None elsewhere."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(base_params)
    out = []
    for i, (path, leaf) in enumerate(flat):
        p = _path_str(path)
        if _is_target(cfg, p) and leaf.ndim >= 2:
            *lead, _, dout = leaf.shape
            din = _unpacked_in_dim(p, leaf.shape)
            ka = jax.random.fold_in(key, i)
            A = jax.random.normal(ka, (*lead, din, cfg.r), dtype) * 0.01
            B = jnp.zeros((*lead, cfg.r, dout), dtype)
            out.append({"A": A, "B": B})
        else:
            out.append(None)
    return jax.tree_util.tree_unflatten(treedef, out)


def merge_lora(cfg: LoraConfig, base_params: Any, lora_params: Any):
    """W_eff = W + scale · A@B at targeted leaves (batched over any leading
    layer-stack dims)."""

    def merge(base, lora):
        if lora is None:
            return base
        if jnp.issubdtype(base.dtype, jnp.integer):
            # quantized bases train fine (side path), but merging would
            # round the bf16 delta into the int grid (int8) or add to
            # packed words (int4) — keep the LoRA unmerged for quantized
            # serving, or dequantize before merge-and-unload
            raise ValueError(
                "merge_lora into a quantized base is unsupported; merge "
                "into the bf16 weights before quantize_params, or serve "
                "with the LoRA side path unmerged")
        A, B = lora["A"], lora["B"]
        delta = jnp.einsum(
            "...ir,...ro->...io", A, B,
            preferred_element_type=jnp.float32).astype(base.dtype)
        return base + cfg.scale * delta

    return jax.tree_util.tree_map(
        merge, base_params, lora_params,
        is_leaf=lambda x: x is None or (isinstance(x, dict) and "A" in x),
    )


def lora_param_count(lora_params: Any) -> int:
    return sum(
        x.size for x in jax.tree_util.tree_leaves(lora_params)
        if hasattr(x, "size"))
