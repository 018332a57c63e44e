"""Shared CLI plumbing: mesh/platform setup, tokenizers, model zoo configs.

Replaces the reference's per-script setup()/cleanup()/load_model helpers
(train_contrast.py:382-397, :117-195): no process groups to create or destroy
— one process drives all local chips through a Mesh; `jax.distributed.
initialize()` covers multi-host.
"""

from __future__ import annotations

import argparse
import os
import jax

from ..core.dtypes import str2dtype  # noqa: F401 (re-export for CLIs)
from ..core.mesh import MeshConfig, make_mesh
from ..data.chat import ByteTextTokenizer


def setup_platform(args) -> "jax.sharding.Mesh":
    """Initialize distributed runtime (if multi-host) and build the mesh."""
    if getattr(args, "compilation_cache", True):
        cache = os.path.join(os.getcwd(), ".jax_cache")
        try:
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
    ))


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--model_dtype", type=str2dtype, default="bf16")
    p.add_argument("--random_seed", type=int, default=42)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    # measured on v5e at S=512: XLA's fused attention beats the Pallas
    # flash kernel in training (132 vs 213 ms/step contrastive) — the flash
    # path materializes the fp32 bias tensor; flash wins on memory at longer
    # sequences.  Default to xla; flash stays selectable.
    p.add_argument("--attn_impl", type=str, default="xla",
                   choices=["xla", "flash"])
    p.add_argument("--checkpoint_dir", type=str, default="./checkpoints")
    p.add_argument("--load_model_checkpoint_path", type=str, default=None)
    p.add_argument("--save_every_epochs", type=int, default=1)
    return p


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
