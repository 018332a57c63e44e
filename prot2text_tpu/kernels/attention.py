"""Attention kernel dispatch.

`impl`:
  * "xla"   — reference XLA einsum attention, fp32 softmax (always available,
              exact; used for parity tests and CPU).
  * "flash" — Pallas TPU flash attention (kernels/flash_attention.py); falls
              back to "xla" off-TPU.

This replaces the cuDNN/SDPA kernels the reference consumes through
HF EsmModel / LlamaForCausalLM (reference models/modeling_esm2llama_instruct.py
:175-185, :204-215 — the native compute lives in torch; here it is Pallas/XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pallas_single_device_ok() -> bool:
    """Plain (un-shard_map'd) pallas_calls do NOT partition under GSPMD:
    when an ambient mesh with more than one device is active (jax.set_mesh
    in the CLI trainers, or a real multi-chip slice), the XLA paths — which
    GSPMD partitions correctly — must win the dispatch.  Size 0 means no
    ambient mesh (plain single-chip jit); size 1 is a degenerate mesh
    (the 1-chip CLI default) where pallas is safe.  INSIDE a shard_map
    region (every mesh axis Manual — kernels/shard.batch_shard_ctx wraps
    the batch-parallel paths that way) the trace is a per-device program
    and pallas is safe again; a partially-manual region is safe when the
    remaining auto axes carry one device.  The explicitly shard_map'd
    kernels (ring attention) manage their own mesh axes and bypass this
    gate."""
    m = jax.sharding.get_abstract_mesh()
    if m is None or m.size <= 1:
        return True
    from .shard import non_manual_size

    return non_manual_size(m) <= 1


def _xla_attention(q, k, v, bias):
    """q,k,v: (B, H, Sq|Skv, D). bias: fp32 additive, broadcastable to
    (B, H, Sq, Skv). Softmax in fp32, matmuls accumulate fp32."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def _xla_attention_chunked(q, k, v, bias, chunk: int | None = None):
    """Query-chunked XLA attention: per-row math identical to
    `_xla_attention`, but a `lax.map` over Sq chunks bounds the fp32
    scores transient to B*H*chunk*Skv (the unchunked scores for the
    descriptions/hour prefill — B=40, Hq=40, S=544 — are a 1.9 GB fp32
    array whose softmax pipeline peaks ~2.9 GB and OOMs the 16 GB chip
    next to the 14B int4 weights).  Measured at that shape the full
    XLA prefill beats the plain bias-carrying flash kernel by 0.8 s
    (4.07 vs 4.88 s, scripts/bench_prefill_decomp.py) — flash's masked
    block-skipping variant needs 128-tileable sequence lengths, so
    non-tileable prefills route here instead."""
    B, Hq, Sq, D = q.shape
    Skv = k.shape[-2]
    if chunk is None:
        # smallest chunk count whose fp32 scores stay under ~512 MB, chunk
        # rounded up to a sublane multiple — Sq=544 → 4 chunks of 136, no
        # pad rows (pad waste at a fixed chunk=128 cost ~0.2 s/prefill)
        budget = 512 * 1024 * 1024
        nc_min = max(1, -(-(B * Hq * Sq * Skv * 4) // budget))
        per_chunk = -(-Sq // nc_min)
        chunk = max(8, 8 * (-(-per_chunk // 8)))
    if Sq <= chunk:
        return _xla_attention(q, k, v, bias)
    nc = -(-Sq // chunk)
    pad = nc * chunk - Sq
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qc = jnp.moveaxis(qp.reshape(B, Hq, nc, chunk, D), 2, 0)
    if bias.shape[2] == 1:
        # query-invariant bias (pure KV mask): loop-invariant operand —
        # never broadcast over Sq
        out = jax.lax.map(lambda qi: _xla_attention(qi, k, v, bias), qc)
    else:
        # chunk the bias in its OWN dtype and batch/head dims;
        # _xla_attention upcasts per chunk (broadcasting to a full
        # (B, H, Sq, Skv) fp32 array here would re-materialize the exact
        # transient this function exists to bound).  Pad-row bias stays 0
        # → a uniform softmax over garbage rows that are sliced off
        # below; no -inf rows, so no NaNs
        Bb, Hb = bias.shape[0], bias.shape[1]
        bp = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, 0)))
        bc = jnp.moveaxis(bp.reshape(Bb, Hb, nc, chunk, Skv), 2, 0)
        out = jax.lax.map(lambda ab: _xla_attention(ab[0], k, v, ab[1]),
                          (qc, bc))
    out = jnp.moveaxis(out, 0, 2).reshape(B, Hq, nc * chunk, D)
    return out[:, :, :Sq]


def _flash_blocks(sq: int, skv: int):
    """Pick legal Mosaic block sizes, or None if the shape can't tile."""
    for b in (256, 128):
        if sq % b == 0 and skv % b == 0:
            return b
    return None


def flash_eligible(q, k, causal: bool, min_seq: int = 0) -> bool:
    """auto-dispatch rule, measured on v5e (scripts/bench_attention.py):
    flash-masked wins every CAUSAL shape forward-only (-11% at S=512, -33%
    at S=2048 — it skips upper-triangle blocks entirely); for fwd+bwd
    (training) it wins at S>=1024 (2.4x whole-train-step at S=2048, where
    XLA materializes the (B,H,S,S) fp32 logits) but loses ~4% at S=512.
    XLA keeps BIDIRECTIONAL encoder shapes (no blocks to skip, Mosaic
    per-tile overhead).  Non-128-tileable shapes stay on chunked XLA: the
    pad-to-tileable masked-flash route (`masked_flash_padded`) was measured
    SLOWER at the desc-hour prefill (B=40, Hq=40, S=544→640: 4.88 s vs
    4.06 s chunked XLA, scripts/bench_prefill_decomp.py) — at B·H=1600 the
    per-tile Mosaic overhead and VPU softmax lose to XLA's fused pipeline,
    so padding is opt-in via P2T_PAD_FLASH=1 (useful at small B·H)."""
    import os

    from .shard import batch_shard_ctx, kernel_backend_ok

    tileable = (_flash_blocks(q.shape[-2], k.shape[-2]) is not None
                or bool(os.environ.get("P2T_PAD_FLASH")))
    return (causal
            and tileable
            and q.shape[-2] >= min_seq
            and kernel_backend_ok()
            and (pallas_single_device_ok()
                 # on a batch-axes-only mesh the dispatch shard_maps the
                 # kernel over (dp, fsdp) — kernels/shard.py
                 or batch_shard_ctx(q.shape[0]) is not None)
            and q.shape[-1] in (64, 128))


def masked_flash_padded(q, k, v, kv_start, kv_len, causal: bool,
                        interpret: bool = False):
    """`flash_attention_masked` for arbitrary sequence lengths: pads Sq/Skv
    up to the 128-block grid and slices the pad rows back off.  Padded KEYS
    sit beyond kv_start+kv_len so the in-kernel mask excludes them (their
    blocks are skipped entirely when fully out of range); padded QUERY rows
    have sequence index >= every valid key's, so under `causal` they attend
    to the full valid run — never a fully-masked row, never a NaN — and
    their outputs are dropped by the final slice.  Pad-row FLOPs at the
    desc-hour prefill shape (S=544 -> 640) are <1% of the attention math."""
    from .flash_attention import flash_attention_masked

    sq, skv = q.shape[-2], k.shape[-2]
    b = _flash_blocks(sq, skv)
    if b is None:
        b = 128
        pq, pk = (-sq) % b, (-skv) % b
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
    out = flash_attention_masked(
        q, k, v, jnp.asarray(kv_start, jnp.int32),
        jnp.asarray(kv_len, jnp.int32), causal=causal,
        block_q=b, block_k=b, interpret=interpret)
    return out[:, :, :sq]


def dot_product_attention(q, k, v, bias, impl: str = "xla", lengths=None):
    """lengths: optional (kv_start (B,), kv_len (B,), causal: bool) asserting
    the key-validity mask is ONE contiguous run per row (true for every
    collator layout in this repo) — unlocks the bias-free masked flash
    kernel.  impl="auto" applies the differentiable-path rule (flash for
    causal S>=1024); impl="flash" forces flash on any eligible shape —
    forward-only call sites (decode prefill, frozen text tower) use it,
    where flash wins at every causal S.  impl="ring" runs sequence-parallel
    ring attention over the ambient mesh's 'sp' axis (long-context
    training; requires `lengths` and `jax.set_mesh` with sp>1 — see
    kernels/ring_attention.py); batch/head dims ride the data/tensor axes."""
    if impl == "ring":
        if lengths is None:
            # bidirectional towers (ESM2/ESMC) don't carry run lengths and
            # aren't sequence-sharded — they keep XLA under a ring config
            return _xla_attention(q, k, v, bias)
        from .ring_attention import ring_attention

        mesh = jax.sharding.get_abstract_mesh()
        axes = dict(mesh.shape) if mesh is not None else {}
        kv_start, kv_len, causal = lengths
        # shard the batch only over axes that divide B: fsdp is a WEIGHT
        # sharding axis — replicating the batch over it is valid, and the
        # instruct default batch_size=1 with fsdp>1 would otherwise fail at
        # trace time with an opaque shard_map divisibility error
        batch_axis, rem = [], q.shape[0]
        for a in ("dp", "fsdp"):
            n = axes.get(a, 1)
            if n > 1 and rem % n == 0:
                batch_axis.append(a)
                rem //= n
        return ring_attention(
            q, k, v, kv_start=jnp.asarray(kv_start, jnp.int32),
            kv_len=jnp.asarray(kv_len, jnp.int32), causal=causal,
            scale=1.0,  # callers pre-scale q (models/decoder.py)
            batch_axis=tuple(batch_axis) or None,
            head_axis="tp" if "tp" in axes else None)
    if impl in ("flash", "auto") and lengths is not None:
        kv_start, kv_len, causal = lengths
        if flash_eligible(q, k, causal,
                          min_seq=1024 if impl == "auto" else 0):
            from .shard import (
                batch_shard_ctx, force_interpret, shard_map_over_batch,
            )

            interp = force_interpret()
            if not pallas_single_device_ok():
                # flash_eligible passed on a >1-device mesh ⇒ batch-axes-
                # only mesh: run the kernel per device over batch shards
                ctx = batch_shard_ctx(q.shape[0])
                return shard_map_over_batch(
                    lambda q_, k_, v_, s_, l_: masked_flash_padded(
                        q_, k_, v_, s_, l_, causal, interpret=interp),
                    ctx, (q, k, v, jnp.asarray(kv_start, jnp.int32),
                          jnp.asarray(kv_len, jnp.int32)),
                    (0, 0, 0, 0, 0), 0)
            return masked_flash_padded(q, k, v, kv_start, kv_len, causal,
                                       interpret=interp)
    if impl == "flash":
        tileable = (q.shape[-1] in (64, 128)
                    and _flash_blocks(q.shape[-2], k.shape[-2]) is not None)
        if tileable:
            try:
                from .flash_attention import flash_attention_tpu
                from .shard import batch_shard_ctx, shard_map_over_batch

                if (jax.default_backend() == "tpu"
                        and pallas_single_device_ok()):
                    return flash_attention_tpu(q, k, v, bias)
                if jax.default_backend() == "tpu":
                    ctx = batch_shard_ctx(q.shape[0])
                    if ctx is not None and bias.shape[0] in (1, q.shape[0]):
                        bdim = 0 if bias.shape[0] == q.shape[0] else None
                        return shard_map_over_batch(
                            flash_attention_tpu, ctx, (q, k, v, bias),
                            (0, 0, 0, bdim), 0)
            except Exception:
                pass
        # non-tileable flash request (e.g. the desc-hour 544-token prefill):
        # chunked XLA is both faster than the bias flash kernel and bounded
        # in transient memory (see _xla_attention_chunked docstring)
        return _xla_attention_chunked(q, k, v, bias)
    return _xla_attention(q, k, v, bias)
