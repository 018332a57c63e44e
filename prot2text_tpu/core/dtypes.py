"""Dtype policy + CLI coercers.

TPU-native mixed precision: bf16 params/activations with fp32 softmax, norms
and logits — no GradScaler needed (the reference's fp16 autocast+GradScaler
path, train_legacy.py:157-194, is a CUDA workaround that bf16 makes obsolete).

`str2dtype`/`str2bool` mirror the CLI coercers at
reference scripts/utils_argparse.py:6-48.
"""

from __future__ import annotations

import argparse
import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Compute/param/accumulation dtypes threaded through model code."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # softmax / norms / logits always accumulate in fp32

    @classmethod
    def bf16(cls) -> "DTypePolicy":
        return cls(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)

    @classmethod
    def f32(cls) -> "DTypePolicy":
        return cls()

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)


_TRUE = {"yes", "true", "t", "y", "1"}
_FALSE = {"no", "false", "f", "n", "0"}

_DTYPES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "f32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "int8": jnp.int8,
    "int4": jnp.int4,
}


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    s = str(v).lower()
    if s in _TRUE:
        return True
    if s in _FALSE:
        return False
    raise argparse.ArgumentTypeError(f"Boolean value expected, got {v!r}")


def str2dtype(v):
    if not isinstance(v, str):
        return v
    key = v.lower().removeprefix("torch.").removeprefix("jnp.")
    if key not in _DTYPES:
        raise argparse.ArgumentTypeError(f"Unsupported dtype {v!r}")
    return _DTYPES[key]
