"""Mosaic legality probes for the int8 KV-cache kernels.

Questions (each probed as its own tiny pallas_call on the real chip):
  1. f32 -> int8 convert + store inside a kernel (needed to write a
     quantized slot extracted via the one-hot-matmul RMW trick)
  2. int8 `where` select (needed for the pure-int8 slot write kernel)
  3. int8 (1, 1, Hkv, 32, D) block read/write at a DYNAMIC tile-group
     index from a scalar-prefetch index_map (the 32-sublane int8 tile)
  4. int8 -> bf16 convert + MXU matmul (known-good in quant_matmul, but
     re-checked here at the decode-attention shapes)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_int8_kv.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Hkv, T, D = 8, 192, 128


def probe(name, fn):
    try:
        fn()
        print(f"[probe] {name}: OK")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[probe] {name}: FAIL — {msg}")
        return False


def p1_f32_to_int8_store():
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.clip(jnp.round(x_ref[:] * 4.0), -127, 127
                            ).astype(jnp.int8)

    x = jnp.linspace(-20, 20, T * D, dtype=jnp.float32).reshape(T, D)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((T, D), jnp.int8))(x)
    ref = np.clip(np.round(np.asarray(x) * 4.0), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(out), ref)


def p2_int8_select():
    def kernel(a_ref, b_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
        o_ref[:] = jnp.where(rows == 7, a_ref[:], b_ref[:])

    a = jnp.full((T, D), 3, jnp.int8)
    b = jnp.full((T, D), -5, jnp.int8)
    out = np.asarray(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((T, D), jnp.int8))(a, b))
    assert out[7, 0] == 3 and out[8, 0] == -5


def p3_dynamic_int8_group_rmw():
    # aliased int8 cache, (1, Hkv, 32, D) block at tile-group slot//32
    def kernel(idx_ref, kn_ref, g_ref, o_ref):
        slot = idx_ref[0]
        r = slot - (slot // 32) * 32
        rows = jax.lax.broadcasted_iota(jnp.int32, (Hkv, 32, D), 1)
        o_ref[0] = jnp.where(rows == r, kn_ref[:][:, None, :], g_ref[0])

    cache = jnp.zeros((1, Hkv, T, D), jnp.int8) - 1
    kn = jnp.full((Hkv, D), 42, jnp.int8)
    slot = jnp.array([77], jnp.int32)          # group 2, row 13
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((Hkv, D), lambda b, idx: (0, 0)),
            pl.BlockSpec((1, Hkv, 32, D),
                         lambda b, idx: (0, 0, idx[0] // 32, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hkv, 32, D),
                               lambda b, idx: (0, 0, idx[0] // 32, 0)),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, Hkv, T, D), jnp.int8),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slot, kn, cache)
    out = np.asarray(out)
    assert out[0, 0, 77, 0] == 42, out[0, 0, 75:80, 0]
    assert out[0, 0, 76, 0] == -1 and out[0, 0, 78, 0] == -1


def p4_int8_to_bf16_matmul():
    def kernel(q_ref, c_ref, s_ref, o_ref):
        cf = c_ref[:].astype(jnp.bfloat16)                 # (T, D) int8->bf16
        logits = jax.lax.dot_general(
            q_ref[:], cf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (8, T)
        o_ref[:] = logits * s_ref[:]                       # scale row bcast

    q = jnp.ones((8, D), jnp.bfloat16)
    c = jnp.arange(T * D, dtype=jnp.int32).reshape(T, D) % 7 - 3
    c = c.astype(jnp.int8)
    s = jnp.full((1, T), 0.5, jnp.float32)
    out = np.asarray(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, T), jnp.float32)
    )(q, c, s))
    ref = (np.ones((8, D), np.float32)
           @ np.asarray(c, np.float32).T) * 0.5
    np.testing.assert_allclose(out, ref, rtol=1e-2)


def p5_f32_scale_row_rmw():
    # aliased f32 scale row (1, Hkv, T) full-T block, one column updated
    def kernel(idx_ref, sn_ref, s_ref, o_ref):
        slot = idx_ref[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T), 1)
        o_ref[0] = jnp.where(cols == slot, sn_ref[:][:, :1], s_ref[0])

    s = jnp.zeros((1, Hkv, T), jnp.float32) + 0.25
    sn = jnp.full((Hkv, 1), 9.0, jnp.float32)
    slot = jnp.array([77], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((Hkv, 1), lambda b, idx: (0, 0)),
            pl.BlockSpec((1, Hkv, T), lambda b, idx: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hkv, T), lambda b, idx: (0, 0, 0)),
    )
    out = np.asarray(pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, Hkv, T), jnp.float32),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slot, sn, s))
    assert out[0, 0, 77] == 9.0 and out[0, 0, 76] == 0.25


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    ok = True
    ok &= probe("p1 f32->int8 store", p1_f32_to_int8_store)
    ok &= probe("p2 int8 select", p2_int8_select)
    ok &= probe("p3 dynamic int8 32-group RMW", p3_dynamic_int8_group_rmw)
    ok &= probe("p4 int8->bf16 matmul + scale", p4_int8_to_bf16_matmul)
    ok &= probe("p5 f32 scale-row RMW", p5_f32_scale_row_rmw)
    sys.exit(0 if ok else 1)
