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
    # regexes over tree paths (joined with '/').  kernel_q (int8
    # weight-only) is a valid LoRA base — the side path trains in bf16 over
    # the frozen quantized matmul (QLoRA-style); kernel_q4 is deliberately
    # NOT matched (its leading dim is nibble-packed K/2, and training-shape
    # calls take the XLA unpack path anyway — quantize int8 for QLoRA).
    target_patterns: Sequence[str] = (
        r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)"
        r"/kernel(_q)?$",
        r"(qkv|out_proj|ffn_in|ffn_out)/kernel(_q)?$",
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


def init_lora_params(cfg: LoraConfig, base_params: Any, key,
                     dtype=jnp.float32):
    """Returns a tree with the SAME structure as base_params but containing
    {"A","B"} dicts at targeted kernel leaves and None elsewhere."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(base_params)
    out = []
    for i, (path, leaf) in enumerate(flat):
        p = _path_str(path)
        if _is_target(cfg, p) and leaf.ndim >= 2:
            *lead, din, dout = leaf.shape
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
