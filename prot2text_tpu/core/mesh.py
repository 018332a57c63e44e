"""Device mesh construction and batch sharding helpers.

TPU-native replacement for the reference's NCCL process-group topology
(reference: scripts/train_contrast.py:382-397, torch.multiprocessing.spawn at
:706-718).  Instead of one process per GPU coordinated by NCCL, we build a
single `jax.sharding.Mesh` over all chips and express data/FSDP/tensor
parallelism as sharding annotations inside jitted programs; XLA inserts the
ICI/DCN collectives.

Axes:
  * ``dp``   — data parallel (batch axis); gradient psum rides ICI.
  * ``fsdp`` — parameter sharding axis (ZeRO-3-style, reference
               train_legacy.py:314-318 FSDP equivalent).
  * ``tp``   — tensor parallel (attention heads / MLP columns) for the
               large decoders.
  * ``sp``   — sequence/context parallel (ring attention,
               kernels/ring_attention.py) — long-context extension beyond
               the reference; size 1 unless requested.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_FSDP = "fsdp"
AXIS_TP = "tp"
AXIS_SP = "sp"
MESH_AXES = (AXIS_DP, AXIS_FSDP, AXIS_TP, AXIS_SP)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. -1 for dp means "all remaining devices"."""

    dp: int = -1
    fsdp: int = 1
    tp: int = 1
    sp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int, int]:
        fsdp, tp, sp = self.fsdp, self.tp, self.sp
        dp = self.dp
        if dp == -1:
            if n_devices % (fsdp * tp * sp) != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by "
                    f"fsdp*tp*sp={fsdp * tp * sp}"
                )
            dp = n_devices // (fsdp * tp * sp)
        if dp * fsdp * tp * sp != n_devices:
            raise ValueError(
                f"mesh {dp}x{fsdp}x{tp}x{sp} != {n_devices} devices"
            )
        return dp, fsdp, tp, sp


def make_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh with (dp, fsdp, tp, sp) axes over the given devices."""
    if devices is None:
        devices = jax.devices()
    dp, fsdp, tp, sp = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(dp, fsdp, tp, sp)
    return Mesh(dev_array, MESH_AXES)


def local_mesh() -> Mesh:
    """Single-chip mesh (all axes size 1 except dp)."""
    return make_mesh(MeshConfig())


def batch_spec() -> P:
    """Batch dims shard over (dp, fsdp) jointly — pure data parallel view."""
    return P((AXIS_DP, AXIS_FSDP))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch (numpy/jnp arrays) sharded along dim 0 over dp+fsdp."""
    sharding = NamedSharding(mesh, batch_spec())

    def put(x):
        spec = batch_spec() if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    del sharding
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_batch_to(tree, batch_size: int):
    """Pad every array's dim 0 up to `batch_size` (repeat last row), returning
    (padded_tree, valid_count).  Keeps shapes static across the last partial
    batch so the jitted step never recompiles (reference relies on drop_last
    semantics instead)."""
    import numpy as np

    def pad(x):
        x = np.asarray(x)
        n = x.shape[0]
        if n == batch_size:
            return x
        reps = np.repeat(x[-1:], batch_size - n, axis=0)
        return np.concatenate([x, reps], axis=0)

    n_valid = None
    for leaf in jax.tree_util.tree_leaves(tree):
        n_valid = np.asarray(leaf).shape[0]
        break
    return jax.tree_util.tree_map(pad, tree), n_valid
