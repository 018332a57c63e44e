"""In-place KV-cache slot write as a Pallas kernel.

Profiling showed XLA materializes a full copy of the (L, T, B, Hkv, D) cache
for every decode-step `dynamic_update_slice` (~40% of decode time) because it
cannot prove in-place safety through the while-loop carry.  This kernel makes
the in-place contract explicit with `input_output_aliases`: the cache rides in
ANY/HBM aliased to the output, and each grid step DMAs one layer's new slot
row into place — bytes moved per step: L·B·Hkv·D instead of the whole cache.

The cache is viewed as (L, T, N/128, 128) with N = B·Hkv·D (a free reshape
of the contiguous sequence-leading layout) so the slot dim T is a LEADING
(untiled) dim and single-slot DMA slices are legal; Mosaic requires
N % 128 == 0, callers fall back to `dynamic_update_slice` otherwise.
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
