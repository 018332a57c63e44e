"""Ring attention — sequence-parallel exact attention over a mesh axis.

Long-context extension beyond the reference (whose inputs are <= ~1.6k
tokens and whose attention is single-GPU SDPA, reference
models/modeling_esm2llama_instruct.py:204-215): shards the SEQUENCE
dimension of q/k/v over a mesh axis and rotates k/v blocks around the ring
with `jax.lax.ppermute` while accumulating an online softmax (the
blockwise-attention recurrence flash attention uses, here with one block
per device).  Each device only ever holds S/n of the sequence, so the
max trainable context scales linearly with the ring size; the k/v block
transfer rides ICI and overlaps with the block einsums.

Numerics: exact (fp32 running max/sum accumulators) — equivalence vs the
single-device XLA attention is tested on a CPU mesh in
tests/test_ring_attention.py, forward and gradients.

Masking follows the repo's contiguous-run contract (models/decoder.py
`contiguous_lengths`): per-row key validity is one run [kv_start,
kv_start+kv_len), plus an optional causal predicate on GLOBAL positions
(each device knows its block offset from `axis_index`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)  # finite "-inf" (no NaNs in bwd)


def ring_attention_local(q, k, v, kv_start, kv_len, *, axis_name: str,
                         causal: bool = True, scale: Optional[float] = None,
                         remat: bool = True):
    """The per-device body — call INSIDE shard_map.

    q, k, v:  (B, H, Sc, D) local sequence shards (H may differ between q
              and k/v only by a grouped-query repeat done by the caller).
    kv_start, kv_len: (B,) GLOBAL contiguous key-validity run (replicated).
    Returns (B, H, Sc, D) in v.dtype — the local shard of the output.
    """
    B, H, Sc, D = q.shape
    Skv = k.shape[2]
    n = jax.lax.axis_size(axis_name)          # static mesh-axis size
    me = jax.lax.axis_index(axis_name)
    if scale is None:
        scale = D ** -0.5

    rows = me * Sc + jnp.arange(Sc)                       # global q positions
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)

    perm = [(j, (j - 1) % n) for j in range(n)]           # rotate blocks left

    def step(carry, j):
        o, m, l, k, v = carry
        blk = (me + j) % n                                # owner of this k/v
        cols = blk * Skv + jnp.arange(Skv)                # global k positions
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k,
                            preferred_element_type=jnp.float32)
        valid = jnp.logical_and(
            cols[None, :] >= kv_start[:, None],
            cols[None, :] < (kv_start + kv_len)[:, None])  # (B, Skv)
        valid = valid[:, None, None, :]                    # (B,1,1,Skv)
        if causal:
            valid = jnp.logical_and(
                valid, (cols[None, :] <= rows[:, None])[None, None])
        logits = jnp.where(valid, logits, _NEG)

        m_new = jnp.maximum(m, logits.max(axis=-1))        # (B,H,Sc)
        safe = jnp.where(m_new <= _NEG / 2, 0.0, m_new)
        p = jnp.exp(logits - safe[..., None]) * valid      # masked probs
        alpha = jnp.exp(m - safe) * (m > _NEG / 2)         # old-acc rescale
        l = l * alpha + p.sum(axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32)
        m = m_new
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        return (o, m, l, k, v), None

    if remat:
        step = jax.checkpoint(step)

    o0 = jnp.zeros((B, H, Sc, D), jnp.float32)
    m0 = jnp.full((B, H, Sc), _NEG, jnp.float32)
    l0 = jnp.zeros((B, H, Sc), jnp.float32)
    (o, m, l, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v), jnp.arange(n))
    out = jnp.where(l[..., None] > 0, o / jnp.maximum(l, 1e-30)[..., None],
                    0.0)
    return out.astype(v.dtype)


def ring_attention(q, k, v, *, mesh: Optional[Mesh] = None,
                   axis_name: str = "sp",
                   kv_start=None, kv_len=None, causal: bool = True,
                   scale: Optional[float] = None, remat: bool = True,
                   batch_axis=None, head_axis=None):
    """Sequence-parallel attention over `axis_name` of `mesh`.

    q, k, v: (B, H, S, D) GLOBAL arrays (or already sharded on dim 2);
    S must divide evenly by the axis size.  kv_start/kv_len: (B,) global
    contiguous key-validity run (default: all keys valid).  Set
    `batch_axis` / `head_axis` to additionally shard B / H over data /
    tensor axes (axis name or tuple of names).  With mesh=None
    the AMBIENT mesh is used (`jax.set_mesh(...)` — how the CLIs run their
    jitted steps, cli/common.py), so `attn_impl="ring"` needs no mesh
    plumbing through the model stack.
    Returns (B, H, S, D).
    """
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or axis_name not in mesh.shape:
            raise ValueError(
                f"ring attention needs an ambient mesh with a '{axis_name}' "
                "axis — wrap the call in jax.set_mesh(make_mesh(MeshConfig("
                "sp=...)))")
    B, H, S, D = q.shape
    n = mesh.shape[axis_name]
    if S % n != 0:
        raise ValueError(f"sequence {S} not divisible by ring size {n}")
    if kv_start is None:
        kv_start = jnp.zeros((B,), jnp.int32)
    if kv_len is None:
        kv_len = jnp.full((B,), S, jnp.int32)
    kv_start = jnp.asarray(kv_start, jnp.int32)
    kv_len = jnp.asarray(kv_len, jnp.int32)

    seq_spec = P(batch_axis, head_axis, axis_name, None)
    rep_spec = P(batch_axis)

    body = functools.partial(
        ring_attention_local, axis_name=axis_name, causal=causal,
        scale=scale, remat=remat)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, rep_spec, rep_spec),
        out_specs=seq_spec, check_vma=False)
    return fn(q, k, v, kv_start, kv_len)
