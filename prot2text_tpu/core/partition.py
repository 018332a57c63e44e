"""Parameter partitioning: path-regex → PartitionSpec rules.

TPU-native replacement for FSDP's `size_based_auto_wrap_policy`
(reference scripts/train_legacy.py:314-318): instead of wrapping modules, each
parameter leaf gets a `NamedSharding` derived from its tree path, and pjit/XLA
handle gather/scatter of shards around the matmuls.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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


class PartitionRules:
    """Ordered list of (regex, PartitionSpec); first match wins.

    A rule spec may contain axis names or None per dimension. Dims whose size
    is not divisible by the mesh axis fall back to replication on that dim.
    """

    def __init__(self, rules: Sequence[tuple[str, P]], default: P = P()):
        self.rules = [(re.compile(pat), spec) for pat, spec in rules]
        self.default = default

    def spec_for(self, path: str, shape: tuple[int, ...], mesh: Mesh) -> P:
        for pat, spec in self.rules:
            if pat.search(path):
                return _fit_spec(spec, shape, mesh)
        return _fit_spec(self.default, shape, mesh)

    def tree_specs(self, params: Any, mesh: Mesh):
        def f(path, leaf):
            return self.spec_for(_path_str(path), leaf.shape, mesh)

        return jax.tree_util.tree_map_with_path(f, params)


def _axis_size(mesh: Mesh, axis) -> int:
    if axis is None:
        return 1
    if isinstance(axis, (tuple, list)):
        size = 1
        for a in axis:
            size *= mesh.shape[a]
        return size
    return mesh.shape[axis]


def _fit_spec(spec: P, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Drop sharding on dims that don't divide evenly / don't exist."""
    out = []
    for i, axis in enumerate(tuple(spec)):
        if i >= len(shape):
            break
        if axis is not None and shape[i] % _axis_size(mesh, axis) == 0:
            out.append(axis)
        else:
            out.append(None)
    while len(out) < len(shape):
        out.append(None)
    return P(*out)


def param_partition_spec(params: Any, mesh: Mesh, rules: PartitionRules):
    return rules.tree_specs(params, mesh)


def named_sharding(mesh: Mesh, spec_tree):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Any, mesh: Mesh, rules: PartitionRules):
    """device_put every leaf with its rule-derived NamedSharding."""
    specs = rules.tree_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


# Default rules for the transformer stacks in this repo.  Layer-stacked params
# have shape (n_layers, ...), so dim 0 is the scan axis: never shard it with
# tp; fsdp shards the largest non-scan dim.
DEFAULT_RULES = PartitionRules(
    rules=[
        # embeddings: (vocab, hidden) — shard vocab over fsdp, hidden over tp
        (r"embed_tokens|word_embeddings|lm_head", P("fsdp", "tp")),
        # stacked attention projections: (L, hidden, heads*dim) etc.
        (r"(q_proj|k_proj|v_proj|query|key|value)/kernel", P(None, "fsdp", "tp")),
        (r"(o_proj|out_proj|attn_out)/kernel", P(None, "tp", "fsdp")),
        # stacked MLP: up/gate column-parallel, down row-parallel
        (r"(gate_proj|up_proj|fc1|intermediate)/kernel", P(None, "fsdp", "tp")),
        (r"(down_proj|fc2|output)/kernel", P(None, "tp", "fsdp")),
        # biases / norms: replicate
        (r"(bias|scale|norm)", P()),
    ],
    default=P(),
)
