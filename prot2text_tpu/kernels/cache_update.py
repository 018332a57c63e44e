"""In-place KV-cache slot writes as Pallas kernels.

XLA refuses to update a while-carried KV cache in place through a plain
`dynamic_update_slice` (full-cache copy per decoded token, profiler-verified
in both layouts); `input_output_aliases` on a Pallas call is the reliable
in-place mechanism.  Two kernels, one per cache layout
(models/decoder.kv_cache_layout):

* `cache_slot_write` — (L, T, B, Hkv, D) sequence-leading (D=64 models).
  Viewed as (L, T, N/128, 128) with N = B·Hkv·D (a free reshape of the
  contiguous layout) so the slot dim T is a LEADING untiled dim and
  single-slot DMA slices are legal; requires N % 128 == 0.
* `cache_slot_write_bkt` — (L, B, Hkv, T, D) batch-leading (D=128
  flagships).  T sits in the trailing (8, 128) tile pair, so single-slot
  DMA slices are illegal; instead one (8, 128) tile group per
  (layer, head-batch) is read-modify-written with the new slot masked in.

Callers fall back to `dynamic_update_slice` off-TPU / on unsupported shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_inplace(cache_shape) -> bool:
    L, T, B, Hkv, D = cache_shape
    return (B * Hkv * D) % 128 == 0


def _write_kernel(idx_ref, new_ref, cache_in, cache_out, sem):
    # cache_in is aliased to cache_out — write in place
    del cache_in
    l = pl.program_id(0)
    t = idx_ref[0]
    dma = pltpu.make_async_copy(
        new_ref.at[0],                             # (1, N) VMEM block row
        cache_out.at[l, pl.ds(t, 1)],              # (1, N) slab
        sem,
    )
    dma.start()
    dma.wait()


def _write_kv_kernel(idx_ref, new_k_ref, new_v_ref, ck_in, cv_in,
                     ck_out, cv_out, sem_k, sem_v):
    del ck_in, cv_in
    l = pl.program_id(0)
    t = idx_ref[0]
    dk = pltpu.make_async_copy(new_k_ref.at[0], ck_out.at[l, pl.ds(t, 1)],
                               sem_k)
    dv = pltpu.make_async_copy(new_v_ref.at[0], cv_out.at[l, pl.ds(t, 1)],
                               sem_v)
    dk.start()
    dv.start()
    dk.wait()
    dv.wait()


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("interpret",))
def cache_slot_write_kv(cache_k, cache_v, new_k, new_v, index, *,
                        interpret: bool = False):
    """Both caches written in one aliased pallas_call (halves call overhead
    and gives XLA one fewer aliasing decision than two separate calls)."""
    L, T, B, Hkv, D = cache_k.shape
    N = B * Hkv * D
    C = N // 128
    idx = jnp.asarray(index, jnp.int32).reshape(1)
    ck = cache_k.reshape(L, T, C, 128)
    cv = cache_v.reshape(L, T, C, 128)
    nk = new_k.astype(cache_k.dtype).reshape(L, 1, C, 128)
    nv = new_v.astype(cache_v.dtype).reshape(L, 1, C, 128)
    new_spec = pl.BlockSpec((1, 1, C, 128), lambda l, idx_ref: (l, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[new_spec, new_spec,
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )
    ck, cv = pl.pallas_call(
        _write_kv_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(ck.shape, ck.dtype),
                   jax.ShapeDtypeStruct(cv.shape, cv.dtype)],
        input_output_aliases={3: 0, 4: 1},  # cache inputs → outputs
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, nk, nv, ck, cv)
    return (ck.reshape(L, T, B, Hkv, D), cv.reshape(L, T, B, Hkv, D))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("interpret",))
def cache_slot_write(cache, new, index, *, interpret: bool = False):
    """cache: (L, T, B, Hkv, D); new: (L, B, Hkv, D); index: scalar int32.
    Returns the cache with slot `index` filled, updated IN PLACE."""
    L, T, B, Hkv, D = cache.shape
    N = B * Hkv * D
    C = N // 128
    idx = jnp.asarray(index, jnp.int32).reshape(1)
    cache_flat = cache.reshape(L, T, C, 128)
    new_flat = new.astype(cache.dtype).reshape(L, 1, C, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, 1, C, 128), lambda l, idx_ref: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache_flat.shape, cache.dtype),
        input_output_aliases={2: 0},   # cache input (after scalar+new) → out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, new_flat, cache_flat)
    return out.reshape(L, T, B, Hkv, D)


# ---------------------------------------------------------------------------
# batch-leading layout (L, B, Hkv, T, D) — round-2 cache layout
#
# T sits in the trailing (8, 128) tile pair, so single-slot DMA slices are
# illegal; instead view the cache as (L, N=B*Hkv, T//8, 8, D) (bitcast-free
# in the default layout: the (T//8, 8) split matches the physical 8-row
# tiling) and read-modify-write ONE 8-slot group per (layer, head-batch):
# ~2*L*N*8*D bytes per step instead of a full-cache copy (XLA refuses to
# update the while-carry in place through a plain dynamic_update_slice —
# 106 ms/step-loop at 1B scale, profiler-verified).


def _write_group_kernel(idx_ref, new_ref, cache_in, cache_out,
                        scratch, sem_in, sem_out, *, d: int):
    del cache_in
    l = pl.program_id(0)
    slot = idx_ref[0]
    spg = 1024 // d                              # slots per (8, 128) group
    tg = slot // spg
    s = slot % spg
    load = pltpu.make_async_copy(
        cache_out.at[l, :, pl.ds(tg, 1)],        # (N, 1, 8, 128)
        scratch, sem_in)
    load.start()
    load.wait()
    rows = jax.lax.broadcasted_iota(jnp.int32, scratch.shape, 2)
    cols = jax.lax.broadcasted_iota(jnp.int32, scratch.shape, 3)
    flat = rows * 128 + cols
    mask = jnp.logical_and(flat >= s * d, flat < (s + 1) * d)
    # value at flat position s*d + j is new[n, j]; since d divides 128,
    # new tiled along the lane dim satisfies tiled[n, c] == new[n, c % d]
    new = new_ref[0]                             # (N, 1, 128//d * d = 128)
    scratch[:] = jnp.where(mask, new[:, :, None, :], scratch[:])
    store = pltpu.make_async_copy(
        scratch, cache_out.at[l, :, pl.ds(tg, 1)], sem_out)
    store.start()
    store.wait()


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("interpret",))
def cache_slot_write_bkt(cache, new, index, *, interpret: bool = False):
    """cache: (L, B, Hkv, T, D) batch-leading; new: (L, B, Hkv, D);
    index: scalar int32 slot.  In-place via input_output_aliases; bytes
    moved per call = 2 * L * B*Hkv * 8*128 * itemsize (one tile group per
    (layer, head-batch)) instead of a full-cache copy."""
    L, B, K, T, D = cache.shape
    N = B * K
    spg = 1024 // D
    idx = jnp.asarray(index, jnp.int32).reshape(1)
    # (T, D) viewed as (T//spg, 8, 128): row-major contiguous, minor dim
    # exactly one 128-lane tile row — Mosaic-legal group slices
    cf = cache.reshape(L, N, T // spg, 8, 128)
    reps = 128 // D
    nf = jnp.tile(new.astype(cache.dtype).reshape(L, N, 1, D), (1, 1, 1, reps))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, N, 1, 128), lambda l, idx_ref: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((N, 1, 8, 128), cache.dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        functools.partial(_write_group_kernel, d=D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cf.shape, cache.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, nf, cf)
    return out.reshape(L, B, K, T, D)


def supports_inplace_bkt(cache_shape) -> bool:
    L, B, K, T, D = cache_shape
    return (D in (32, 64, 128)
            and T % (1024 // D) == 0
            and (B * K) % 8 == 0)
