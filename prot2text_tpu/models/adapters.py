"""Modality adapters: 2-layer MLP and RGCN over protein structure graphs.

ModalityAdapter (reference models/modeling_esm2llama_instruct.py:45-68):
  fc1 → GELU → dropout → fc2 → GELU → dropout → L2-normalize.
  The reference keeps two DEPRECATED LayerNorms (ln1/ln2, :56-57) purely for
  checkpoint compatibility — they are NOT applied in forward, so this build
  omits them.

RgcnAdapter (reference models/modeling_esm2rgcn2llama_instruct.py:173-229):
  fc1 → n_layers × [RGCN → GELU → dropout] on node tokens only (bos/eos
  positions excluded, :208-214) → write-back → fc2 → GELU → dropout → L2-norm.

TPU-native RGCN: instead of pyg_lib's segment-matmul grouped GEMM over a
ragged edge list (:102-137), nodes stay in the padded (B, S, D) layout and
messages are computed as R dense matmuls + one masked segment-sum
(see kernels/rgcn.py) — fixed shapes, MXU-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels.rgcn import rgcn_conv
from .transformer import linear


@dataclasses.dataclass(frozen=True)
class ModalityAdapterConfig:
    """Mirrors reference models/modality_config.py:2-18."""

    input_dim: int
    intermediate_dim: int
    output_dim: int
    dropout_rate: float = 0.3


def init_modality_adapter_params(cfg: ModalityAdapterConfig, key,
                                 dtype=jnp.float32):
    k1, k2 = jax.random.split(key)

    def dense(kk, din, dout):
        return {
            "kernel": jax.random.normal(kk, (din, dout), dtype) * 0.02,
            "bias": jnp.zeros((dout,), dtype),
        }

    return {
        "fc1": dense(k1, cfg.input_dim, cfg.intermediate_dim),
        "fc2": dense(k2, cfg.intermediate_dim, cfg.output_dim),
    }


def _gelu_erf(x):
    """torch.nn.GELU() default (approximate='none') — exact erf form."""
    x32 = x.astype(jnp.float32)
    y = x32 * 0.5 * (1.0 + jax.lax.erf(x32 / jnp.sqrt(2.0).astype(jnp.float32)))
    return y.astype(x.dtype)


def _dropout(x, rate: float, key, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def modality_adapter_params_from_torch(sd, dtype=jnp.float32,
                                       prefix: str = ""):
    """Convert a reference ModalityAdapter state dict (adapter-only
    checkpoints saved by train_contrast.py:674-690).  The deprecated ln1/ln2
    LayerNorms that the reference keeps for checkpoint compatibility
    (modeling_esm2llama_instruct.py:56-57) are present in such state dicts
    but never applied — they are ignored here."""
    import numpy as np

    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x)

    def dense(name):
        return {
            "kernel": jnp.asarray(_np(sd[prefix + name + ".weight"]).T, dtype),
            "bias": jnp.asarray(_np(sd[prefix + name + ".bias"]), dtype),
        }

    return {"fc1": dense("fc1"), "fc2": dense("fc2")}


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """torch F.normalize parity: x / max(||x||, eps)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=axis, keepdims=True))
    return (x32 / jnp.maximum(norm, eps)).astype(x.dtype)


def modality_adapter(cfg: ModalityAdapterConfig, params, hidden_states, *,
                     deterministic: bool = True,
                     dropout_key: Optional[jax.Array] = None):
    """(B, S, input_dim) → (B, S, output_dim), L2-normalized per token."""
    if not deterministic:
        dk1, dk2 = jax.random.split(dropout_key)
    h = _gelu_erf(linear(params["fc1"], hidden_states))
    if not deterministic:
        h = _dropout(h, cfg.dropout_rate, dk1, deterministic)
    h = _gelu_erf(linear(params["fc2"], h))
    if not deterministic:
        h = _dropout(h, cfg.dropout_rate, dk2, deterministic)
    return l2_normalize(h)


# ---------------------------------------------------------------------------
# RGCN adapter


@dataclasses.dataclass(frozen=True)
class RgcnAdapterConfig:
    """Mirrors reference configuration_esm2rgcn2llama_instruct.py:11-31."""

    input_dim: int
    intermediate_dim: int
    output_dim: int
    n_relations: int = 7
    n_layers: int = 6
    dropout_rate: float = 0.2
    # optional RGCNConv weight decompositions (reference RgcnConvLayer
    # carries the full torch_geometric dispatch,
    # modeling_esm2rgcn2llama_instruct.py:85-100; no reference config
    # enables them — completeness, at most one may be set)
    num_bases: Optional[int] = None
    num_blocks: Optional[int] = None


def init_rgcn_adapter_params(cfg: RgcnAdapterConfig, key, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.n_layers + 2)

    def dense(kk, din, dout):
        return {
            "kernel": jax.random.normal(kk, (din, dout), dtype) * 0.02,
            "bias": jnp.zeros((dout,), dtype),
        }

    d = cfg.intermediate_dim

    if cfg.num_bases is not None and cfg.num_blocks is not None:
        raise ValueError("num_bases and num_blocks are mutually exclusive "
                         "(torch_geometric RGCNConv contract)")
    if cfg.num_blocks is not None and d % cfg.num_blocks:
        raise ValueError(f"intermediate_dim {d} not divisible by "
                         f"num_blocks {cfg.num_blocks}")

    def rgcn_layer(kk):
        if cfg.num_bases is not None:
            # basis decomposition: (B, D, D) shared bases + (R, B) coeffs
            p = {"rel_kernel": jax.random.normal(
                     kk, (cfg.num_bases, d, d), dtype) * 0.02,
                 "comp": jax.random.normal(
                     jax.random.fold_in(kk, 2),
                     (cfg.n_relations, cfg.num_bases), dtype) * 0.02}
        elif cfg.num_blocks is not None:
            nb = cfg.num_blocks
            p = {"rel_kernel": jax.random.normal(
                kk, (cfg.n_relations, nb, d // nb, d // nb), dtype) * 0.02}
        else:
            # (R, D, D) per-relation weights
            p = {"rel_kernel": jax.random.normal(
                kk, (cfg.n_relations, d, d), dtype) * 0.02}
        p["root_kernel"] = jax.random.normal(
            jax.random.fold_in(kk, 1), (d, d), dtype) * 0.02
        p["bias"] = jnp.zeros((d,), dtype)
        return p

    layers = [rgcn_layer(keys[i]) for i in range(cfg.n_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "fc1": dense(keys[-2], cfg.input_dim, d),
        "rgcn_layers": stacked,
        "fc2": dense(keys[-1], d, cfg.output_dim),
    }


def node_mask_from_attention(attention_mask):
    """Reference :208-214: valid tokens minus bos (position 0) and eos
    (position sum(mask)-1).  attention_mask: (B, S) → bool (B, S)."""
    B, S = attention_mask.shape
    mask = attention_mask.astype(bool)
    idx = jnp.arange(S)[None, :]
    eos_idx = attention_mask.sum(axis=1)[:, None] - 1
    mask = jnp.logical_and(mask, idx != 0)
    mask = jnp.logical_and(mask, idx != eos_idx)
    return mask


def rgcn_adapter(
    cfg: RgcnAdapterConfig,
    params,
    hidden_states,        # (B, S, input_dim) — ESM hidden states (incl bos/eos)
    attention_mask,       # (B, S)
    edge_index,           # (2, E_max) int32, batch-local (b, s) flattened as b*S+s
    edge_type,            # (E_max,) int32 in [0, R)
    edge_mask,            # (E_max,) 0/1 — padded edges
    *,
    deterministic: bool = True,
    dropout_key: Optional[jax.Array] = None,
):
    """Padded-graph RGCN adapter.

    Graphs are batched by flattening (B, S) node grid to B*S and expressing
    edges in that flat index space (data/collate_graph.py builds these); padded
    edges carry edge_mask=0.  Semantics match the reference: only non-bos/eos
    valid tokens participate as nodes; other positions pass through fc1→fc2.
    """
    B, S, _ = hidden_states.shape
    if not deterministic:
        dkeys = jax.random.split(dropout_key, cfg.n_layers + 2)

    h = _gelu_erf(linear(params["fc1"], hidden_states))
    if not deterministic:
        h = _dropout(h, cfg.dropout_rate, dkeys[0], deterministic)

    nmask = node_mask_from_attention(attention_mask)  # (B, S)
    flat = h.reshape(B * S, -1)
    nodes = flat * nmask.reshape(-1, 1)  # zero non-node positions

    def layer_step(x, lp_and_key):
        lp, i = lp_and_key
        y = rgcn_conv(
            x, edge_index, edge_type, edge_mask,
            rel_kernel=lp["rel_kernel"], root_kernel=lp["root_kernel"],
            bias=lp["bias"], node_mask=nmask.reshape(-1),
            comp=lp.get("comp"),
        )
        y = _gelu_erf(y)
        if not deterministic:
            y = _dropout(y, cfg.dropout_rate, dkeys[1 + i], deterministic)
        return y, None

    x = nodes
    # n_layers is small (6) — unrolled python loop keeps per-layer params
    lp_all = params["rgcn_layers"]
    for i in range(cfg.n_layers):
        lp = jax.tree_util.tree_map(lambda a, i=i: a[i], lp_all)
        x, _ = layer_step(x, (lp, i))

    # write back RGCN outputs at node positions only
    h = jnp.where(nmask.reshape(B, S, 1), x.reshape(B, S, -1), h)

    h = _gelu_erf(linear(params["fc2"], h))
    if not deterministic:
        h = _dropout(h, cfg.dropout_rate, dkeys[-1], deterministic)
    return l2_normalize(h)
