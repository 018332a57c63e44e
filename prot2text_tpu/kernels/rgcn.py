"""RGCN relational graph convolution over padded edge buffers.

TPU-native replacement for pyg_lib's `segment_matmul` grouped GEMM +
torch_scatter (reference models/modeling_esm2rgcn2llama_instruct.py:102-152).
Semantics match `torch_geometric.nn.RGCNConv` with default mean aggregation:

    out_i = x_i @ W_root + bias + Σ_r mean_{j ∈ N_r(i)} (x_j @ W_r)

Graphs are padded to a fixed edge budget (edge_mask marks real edges), so the
whole conv jits with static shapes.  Messages use `jax.ops.segment_sum` —
XLA lowers this to an efficient sorted-scatter on TPU; the (R, D, D) relation
matmul batch rides the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgcn_conv(
    x,              # (N, D) node features (flat batch; non-node rows are zero)
    edge_index,     # (2, E) int32 [src; dst] in flat node space
    edge_type,      # (E,) int32 in [0, R)
    edge_mask,      # (E,) 0/1
    *,
    rel_kernel,     # (R, D, D)
    root_kernel,    # (D, D)
    bias,           # (D,)
    node_mask=None,  # (N,) bool — rows to treat as real nodes
):
    N, D = x.shape
    R = rel_kernel.shape[0]
    src, dst = edge_index[0], edge_index[1]
    emask = edge_mask.astype(x.dtype)  # (E,)

    x_src = x[src]  # (E, D)

    # Per-relation mean aggregation, then relation matmul on the (N, D) side:
    #   agg_r = segment_mean of x_j over incoming r-edges  → (N, D)
    #   out  += agg_r @ W_r
    # Stack the R aggregations and do ONE batched (R, N, D)x(R, D, D) matmul
    # so the MXU sees a single large grouped GEMM.
    aggs = []
    for r in range(R):
        w = emask * (edge_type == r).astype(x.dtype)  # (E,)
        msg = x_src * w[:, None]
        s = jax.ops.segment_sum(msg, dst, num_segments=N)
        cnt = jax.ops.segment_sum(w, dst, num_segments=N)
        aggs.append(s / jnp.maximum(cnt, 1.0)[:, None])
    agg = jnp.stack(aggs)  # (R, N, D)

    rel_out = jnp.einsum(
        "rnd,rde->ne", agg, rel_kernel.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    out = rel_out + jnp.matmul(
        x, root_kernel.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype) + bias.astype(x.dtype)

    if node_mask is not None:
        out = out * node_mask.astype(x.dtype)[:, None]
    return out
