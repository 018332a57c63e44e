"""Shared CLI plumbing: mesh/platform setup, tokenizers, model zoo configs.

Replaces the reference's per-script setup()/cleanup()/load_model helpers
(train_contrast.py:382-397, :117-195): no process groups to create or destroy
— one process drives all local chips through a Mesh; `jax.distributed.
initialize()` covers multi-host.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.dtypes import str2dtype  # noqa: F401 (re-export for CLIs)
from ..core.mesh import AXIS_DP, AXIS_FSDP, MeshConfig, make_mesh
from ..core.partition import DEFAULT_RULES, shard_params
from ..data.chat import ByteTextTokenizer


def shard_model_params(mesh, params):
    """Shard a large parameter tree over the (fsdp, tp) mesh axes per
    DEFAULT_RULES.  This is what makes `--fsdp/--tp` real in the entry
    points: the frozen 14B+600M towers live sharded on the mesh instead of
    replicated per chip (reference FSDP capability, train_legacy.py:314-318).
    Also correct for optax states whose mu/nu mirror the param tree paths.

    When this actually shards weights over fsdp on a batch-axes-only mesh
    (tp=sp=1), the Pallas batch shard_map wrap (kernels/shard.batch_shard_ctx)
    is auto-disabled via P2T_NO_SHARD_MAP_BATCH: that wrap declares params
    replicated, so a wrapped decode step would all-gather the FULL weight set
    per device per step — exactly the memory the fsdp sharding exists to
    save (advisor r4, shard.py:92)."""
    out = shard_params(params, mesh, DEFAULT_RULES)
    shape = dict(mesh.shape)
    if (shape.get("fsdp", 1) > 1 and shape.get("tp", 1) <= 1
            and shape.get("sp", 1) <= 1
            and not os.environ.get("P2T_NO_SHARD_MAP_BATCH")):
        def _sharded(leaf):
            spec = getattr(getattr(leaf, "sharding", None), "spec", None)
            return spec is not None and any(a is not None for a in spec)

        if any(_sharded(l) for l in jax.tree_util.tree_leaves(out)):
            os.environ["P2T_NO_SHARD_MAP_BATCH"] = "1"
            print("NOTE: weights are fsdp-sharded; disabling the Pallas "
                  "batch shard_map wrap (P2T_NO_SHARD_MAP_BATCH=1) to avoid "
                  "per-step full-weight all-gathers", file=sys.stderr)
    return out


def replicate_tree(mesh, tree):
    """Fully replicate a (small, trainable) pytree over the mesh — the
    LoRA/adapter trees stay replicated while grads psum over the data axes."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


_warned_batch_sizes = set()


def place_batch(mesh, batch: dict, batch_size: int, batch_dim: int = 0,
                replicate_keys=()):
    """device_put a host batch with the batch dim sharded over (dp, fsdp).

    Only arrays whose dim `batch_dim` equals `batch_size` are sharded —
    everything else (flat graph edge buffers, scalars) replicates.  With
    grad accumulation the arrays are stacked (n_micro, micro_bsz, ...), so
    pass batch_dim=1 and the per-microbatch size.  Without this placement
    GSPMD receives uncommitted host arrays and silently replicates the
    batch, making dp a no-op (round-1 gap)."""
    n_data = mesh.shape[AXIS_DP] * mesh.shape[AXIS_FSDP]
    if n_data > 1 and batch_size % n_data != 0:
        if batch_size not in _warned_batch_sizes:
            _warned_batch_sizes.add(batch_size)
            print(f"WARNING: batch size {batch_size} not divisible by "
                  f"dp*fsdp={n_data}; batch will be replicated",
                  file=sys.stderr)
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        if not isinstance(v, (np.ndarray, jax.Array)):
            out[k] = v
            continue
        arr = np.asarray(v) if isinstance(v, np.ndarray) else v
        shardable = (
            k not in replicate_keys
            and arr.ndim > batch_dim
            and arr.shape[batch_dim] == batch_size
            and batch_size % n_data == 0
        )
        if shardable:
            spec = [None] * arr.ndim
            spec[batch_dim] = (AXIS_DP, AXIS_FSDP)
            out[k] = jax.device_put(arr, NamedSharding(mesh, P(*spec)))
        else:
            out[k] = jax.device_put(arr, repl)
    return out


def setup_platform(args) -> "jax.sharding.Mesh":
    """Initialize distributed runtime (if multi-host) and build the mesh."""
    if getattr(args, "compilation_cache", True):
        cache = os.path.join(os.getcwd(), ".jax_cache")
        try:
            # respect an already-configured cache dir (tests pin a
            # per-xdist-worker dir so suite compiles never race the TPU
            # processes writing .jax_cache — a shared dir segfaulted the
            # suite, round 4)
            if not jax.config.jax_compilation_cache_dir:
                jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    return make_mesh(MeshConfig(
        dp=-1,
        fsdp=getattr(args, "fsdp", 1),
        tp=getattr(args, "tp", 1),
        sp=getattr(args, "sp", 1),
    ))


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--model_dtype", type=str2dtype, default="bf16")
    p.add_argument("--random_seed", type=int, default=42)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence/context-parallel ring size (use with "
                        "--attn_impl ring for long-context training)")
    # measured on v5e (scripts/bench_attention.py): the bias-free masked
    # flash kernel wins every CAUSAL shape forward (-11% S=512, -33% S=2048
    # — it skips upper-triangle blocks) and ties/wins the backward at
    # S>=2048; XLA keeps bidirectional encoder shapes.  "auto" applies that
    # rule per call site (falls back to xla off-TPU / odd shapes).
    p.add_argument("--attn_impl", type=str, default="auto",
                   choices=["auto", "xla", "flash", "ring"])
    p.add_argument("--checkpoint_dir", type=str, default="./checkpoints")
    p.add_argument("--load_model_checkpoint_path", type=str, default=None)
    p.add_argument("--save_every_epochs", type=int, default=1)
    p.add_argument("--log_every", type=int, default=10,
                   help="steps between loss host-syncs (a per-step "
                        "float(loss) costs a full host round-trip, ~20 ms "
                        "through the remote-execution tunnel)")
    return p


class LossLogger:
    """Per-step losses WITHOUT per-step host syncs: device scalars are
    collected and transferred as ONE stacked array every `log_every` steps
    (the reference's tqdm postfix paid a `loss.item()` sync per batch;
    measured here at ~20 ms/step through the remote tunnel — CLAUDE.md).
    Guards run at each flush: warn on non-finite (and, for the contrastive
    trainer, <= 0) losses — reference train_contrast.py:432-434."""

    def __init__(self, log_every: int = 10, positive_required: bool = False,
                 label: str = "loss"):
        self.log_every = max(1, int(log_every))
        self.positive_required = positive_required
        self.label = label
        self._pending: list = []
        self._host: list = []

    def append(self, device_loss):
        self._pending.append(device_loss)
        if len(self._pending) >= self.log_every:
            self._flush()

    def _flush(self):
        if not self._pending:
            return
        import jax.numpy as jnp

        vals = np.asarray(jnp.stack(self._pending))   # one transfer
        self._pending.clear()
        bad = ~np.isfinite(vals)
        if self.positive_required:
            bad |= vals <= 0
        for v in vals[bad]:
            print(f"WARNING: impossible {self.label} {float(v)}",
                  file=sys.stderr)
        self._host.extend(float(v) for v in vals)

    def finish(self) -> tuple:
        """Flush the tail; returns (mean, count) for the epoch print."""
        self._flush()
        n = len(self._host)
        mean = float(np.mean(self._host)) if n else float("nan")
        self._host.clear()
        return mean, n


def text_tokenizer(args):
    """HF tokenizer when a local path is given, else the offline byte
    tokenizer (zero-asset default)."""
    path = getattr(args, "tokenizer_path", None)
    if path:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path)
        if tok.pad_token_id is None:
            tok.pad_token = "<|reserved_special_token_0|>"
        return tok
    return ByteTextTokenizer()


def tiny_demo_dims(args) -> bool:
    return bool(getattr(args, "debug_tiny_model", False))
