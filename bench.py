"""Benchmarks on the real chip. Prints one JSON line PER METRIC (driver
parses the last line → the flagship decode number is printed last).

Metrics (VERDICT round-1 item #4 — flagship scale + utilization):
  1. sft_step — teacher-forcing train step (fwd+bwd+adamw) on an 8L×1024
     decoder, B=8, S=512: tokens/s + MFU vs the v5e bf16 peak (197 TFLOP/s).
  2. decode_tokens_per_sec_bf16_8Lx1024_b16 — round-1 continuity metric.
  3. decode_llama32_1b — Llama-3.2-1B architecture (random bf16 weights,
     real checkpoints don't exist in this zero-egress container), B=16:
     tokens/s + achieved HBM GB/s vs the 819 GB/s v5e peak (decode is
     bandwidth-bound: every step re-reads the full weight set + KV cache).

The reference publishes no numbers (BASELINE.md) — vs_baseline stays null.
Timing forces a host transfer per run because block_until_ready does not
synchronize through the remote-execution tunnel.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os as _os

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if _os.environ.get("BENCH_PLATFORM"):
    # runner plumbing tests force CPU (the axon sitecustomize overrides
    # JAX_PLATFORMS, so an env var alone does not stick)
    jax.config.update("jax_platforms", _os.environ["BENCH_PLATFORM"])

V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_GBPS = 819.0


_CURRENT_FN = None   # set by --only/--group so lines are attributable


def _emit(metric, value, unit, **extra):
    line = {"metric": metric, "value": round(float(value), 2), "unit": unit,
            "vs_baseline": None}
    if _CURRENT_FN:
        line["bench_fn"] = _CURRENT_FN
    line.update(extra)
    print(json.dumps(line), flush=True)


def _time(fn, iters=3):
    fn()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def _param_count(params):
    # int4-packed leaves: kernel_q4 = two weights per int8 byte;
    # kernel_q4p = eight weights per int32 word
    total = 0
    for path, p in jax.tree_util.tree_leaves_with_path(params):
        n = int(np.prod(p.shape))
        if any(getattr(k, "key", None) == "kernel_q4" for k in path):
            n *= 2
        elif any(getattr(k, "key", None) in ("kernel_q4p", "kernel_q4w")
                 for k in path):
            n *= 8
        total += n
    return total


def bench_sft_step():
    """Jitted train step (loss fwd+bwd + adamw) on an 8L×1024 GQA decoder."""
    from prot2text_tpu.models.decoder import (
        DecoderConfig, causal_bias_from_mask, contiguous_lengths,
        cross_entropy_loss, decoder_forward, decoder_logits,
        init_decoder_params,
    )
    import optax

    cfg = DecoderConfig(
        vocab_size=32000, hidden_size=1024, num_layers=8, num_heads=16,
        num_kv_heads=8, intermediate_size=4096, head_dim=64,
        rope_theta=500000.0)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    n_params = _param_count(params)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    B, S = 8, 512
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 32000, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    labels = ids

    def loss_fn(p):
        emb = p["embed_tokens"][ids]
        bias = causal_bias_from_mask(mask)
        pos = jnp.broadcast_to(jnp.arange(S), (B, S))
        # the shipped default path: auto → masked flash on causal shapes
        h, _ = decoder_forward(cfg, p, inputs_embeds=emb, bias=bias,
                               positions=pos, attn_impl="auto", remat=True,
                               attn_lengths=contiguous_lengths(mask))
        return cross_entropy_loss(decoder_logits(cfg, p, h), labels)

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    STEPS = 5

    def run():
        # real training loops sync once per epoch print, not per step —
        # a per-step float(loss) adds a full host round-trip (~20 ms via
        # the remote tunnel) and under-reports throughput ~30%
        nonlocal params, opt_state
        for _ in range(STEPS):
            params, opt_state, loss = step(params, opt_state)
        return float(loss)

    dt = _time(run) / STEPS
    tokens_per_sec = B * S / dt
    # fwd+bwd ≈ 6·params FLOPs per token (+ attention terms, ignored)
    mfu = 6.0 * n_params * tokens_per_sec / V5E_BF16_PEAK_FLOPS
    _emit("sft_train_tokens_per_sec_bf16_8Lx1024_b8_s512", tokens_per_sec,
          "tokens/s", mfu=round(mfu, 4), step_ms=round(dt * 1e3, 1),
          params_m=round(n_params / 1e6, 1))


def _init_quantized_random(cfg, bits=8, int4_format="planes"):
    """Random decoder params DIRECTLY in quantized form (an 8B bf16 init
    would not fit the chip before quantization; throughput does not depend
    on the values).  Every int8 layer leaf is independently random —
    no broadcasts XLA could optimize into smaller HBM reads."""
    from prot2text_tpu.models.decoder import init_decoder_params
    from prot2text_tpu.models.quant import quantize_params

    tiny = type(cfg)(**{**cfg.__dict__, "num_layers": 1})
    one = quantize_params(
        init_decoder_params(tiny, jax.random.PRNGKey(0), jnp.bfloat16),
        bits=bits, int4_format=int4_format)
    L = cfg.num_layers
    key = jax.random.PRNGKey(7)

    def grow(a):
        nonlocal key
        shape = (L,) + a.shape[1:]
        if a.dtype in (jnp.int8, jnp.int4, jnp.int32):
            key, k = jax.random.split(key)
            # random.bits avoids randint's int32 intermediate (4x the
            # target bytes — a 7 GB transient at 14B scale that OOMs when
            # other towers are already resident)
            bits_dtype = jnp.uint32 if a.dtype == jnp.int32 else jnp.uint8
            return jax.jit(lambda kk: jax.random.bits(
                kk, shape, bits_dtype).astype(a.dtype))(k)
        return jnp.full(shape, 0.01, a.dtype)  # fp32 scales

    out = dict(one)
    out["layers"] = jax.tree_util.tree_map(grow, one["layers"])
    return out


def _init_bf16_random_decoder(cfg, drop_lm_head=False):
    """Random bf16 decoder weights at full stacked shape with SMALL
    transients: init_decoder_params peaks at ~2x (per-layer leaves live
    through the jnp.stack) and random.normal materializes f32 — a 16-layer
    5120-wide tower (10.6 GB bf16) OOMs one chip during init that way.
    Here each stacked leaf is generated directly via uint8 random bits
    (1.5 bytes/elem transient); values are iid in ±0.25 — independent
    across layers so XLA cannot shrink the HBM weight streams."""
    from prot2text_tpu.models.decoder import init_decoder_params

    tiny = type(cfg)(**{**cfg.__dict__, "num_layers": 1})
    one = init_decoder_params(tiny, jax.random.PRNGKey(0), jnp.bfloat16)
    if drop_lm_head:
        one.pop("lm_head", None)
    L = cfg.num_layers
    key = jax.random.PRNGKey(11)

    def rand_bf16(shape, scale):
        nonlocal key
        key, kk = jax.random.split(key)
        return jax.jit(lambda k_: (
            jax.random.bits(k_, shape, jnp.uint8).astype(jnp.bfloat16)
            - 127.5) * scale)(kk)

    def grow(a):
        shape = (L,) + a.shape[1:]
        if a.ndim >= 3:          # kernels: random, ±~0.25
            return rand_bf16(shape, 1.0 / 512.0)
        return jnp.ones(shape, jnp.bfloat16)     # ln scales

    out = dict(one)
    out["layers"] = jax.tree_util.tree_map(grow, one["layers"])
    out["embed_tokens"] = rand_bf16((cfg.vocab_size, cfg.hidden_size),
                                    1.0 / 512.0)
    if "lm_head" in out:
        out["lm_head"] = {"kernel": rand_bf16(
            (cfg.hidden_size, cfg.vocab_size), 1.0 / 512.0)}
    return out


def _bench_decode(cfg, name, B=16, P=128, NEW=128, quant_bits=None,
                  quant_direct=False, kv_bits=None, int4_format="planes"):
    """Two-point measurement (scripts/bench_decode_gap.py evidence): one
    generate() call conflates the prompt PREFILL (compute-bound, ~1.5 s at
    8B B=128 P=128) with the decode loop (bandwidth-bound, at the HBM
    floor).  Timing NEW/2 and NEW new tokens and differencing isolates the
    pure decode rate; prefill is reported separately (TTFT-style)."""
    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.decoder import init_decoder_params

    dtype = jnp.bfloat16
    if quant_direct:
        params = _init_quantized_random(cfg, bits=quant_bits or 8,
                                        int4_format=int4_format)
        n_params = _param_count(params)
    else:
        params = init_decoder_params(cfg, jax.random.PRNGKey(0), dtype)
        n_params = _param_count(params)
        if quant_bits:
            from prot2text_tpu.models.quant import quantize_params

            params = quantize_params(params, bits=quant_bits,
                                     int4_format=int4_format)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(
        rng.standard_normal((B, P, cfg.hidden_size)).astype(np.float32),
        dtype)
    mask = jnp.ones((B, P), jnp.int32)

    def run_new(new_tokens):
        gen_cfg = GenerationConfig(
            max_new_tokens=new_tokens, eos_token_id=-1,
            pad_token_id=0)  # never stop

        def run():
            toks = generate(cfg, params, inputs_embeds=emb,
                            attention_mask=mask, gen_cfg=gen_cfg,
                            attn_impl="xla", cache_dtype=dtype,
                            kv_bits=kv_bits)
            return np.asarray(toks)

        return run

    lo, hi = NEW // 2, NEW
    t_lo = _time(run_new(lo))
    t_hi = _time(run_new(hi))
    decode_dt = max((t_hi - t_lo) / (hi - lo), 1e-9)   # s per decode step
    prefill_s = max(t_lo - lo * decode_dt, 0.0)
    toks_per_sec = B / decode_dt
    # bandwidth-bound decode: every step re-reads all weights once and (on
    # average) half the final KV cache
    weight_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "dtype"))
    cache_itemsize = 1 if kv_bits else 2     # int8 KV halves the cache read
    cache_bytes = (2 * cfg.num_layers * (P + NEW / 2) * B
                   * cfg.num_kv_heads * cfg.head_dim * cache_itemsize)
    gbps = (weight_bytes + cache_bytes) / decode_dt / 1e9
    _emit(name, toks_per_sec, "tokens/s",
          hbm_gbps=round(gbps, 1),
          hbm_util=round(gbps / V5E_HBM_GBPS, 3),
          prefill_ms=round(prefill_s * 1e3, 1),
          e2e_tok_s=round(B * hi / t_hi, 1),
          params_m=round(n_params / 1e6, 1),
          batch=B, new_tokens=NEW)


def bench_decode_toy():
    from prot2text_tpu.models.decoder import DecoderConfig

    cfg = DecoderConfig(
        vocab_size=32000, hidden_size=1024, num_layers=8, num_heads=16,
        num_kv_heads=8, intermediate_size=4096, head_dim=64,
        rope_theta=500000.0)
    _bench_decode(cfg, "decode_tokens_per_sec_bf16_8Lx1024_b16")


def bench_decode_flagship_int8():
    """Same flagship config with int8 weight-only quantization (the serving
    configuration — halves the weight bytes the bandwidth-bound decode
    re-reads every step; numerics parity covered by tests/test_quant.py)."""
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_2_1b().core()
    _bench_decode(cfg, "decode_tokens_per_sec_int8_llama32_1b_b16",
                  quant_bits=8)


def bench_decode_flagship():
    """Llama-3.2-1B architecture — the largest flagship config whose bf16
    weights + cache comfortably fit one 16 GB v5e chip."""
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_2_1b().core()
    _bench_decode(cfg, "decode_tokens_per_sec_bf16_llama32_1b_b16")


def bench_decode_8b_int8():
    """The reference's instruct-flagship decoder scale (Llama-3.1-8B
    architecture, README.md:17-19) served on ONE 16 GB v5e chip via int8
    weight-only quantization: ~7 GB int8 layers + bf16 embeddings + KV
    cache ≈ 9.5 GB."""
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_1_8b().core()
    _bench_decode(cfg, "decode_tokens_per_sec_int8_llama31_8b_b16_one_chip",
                  quant_bits=8, quant_direct=True, NEW=64)


def bench_decode_14b_int4():
    """Qwen3-14B architecture (the reference's ESMC-Qwen flagship decoder,
    esmc_qwen_arc.py:208) on ONE 16 GB v5e chip via int4 weight-only
    quantization (nibble-packed, Pallas fused dequant-matmul — a bf16 14B
    needs 28 GB, int8 needs 14 GB + embeddings; int4 is what makes one-chip
    serving possible at all): ~7 GB packed layers + bf16 embeddings + KV."""
    from prot2text_tpu.models.qwen3 import Qwen3Config

    cfg = Qwen3Config.qwen3_14b().core()
    _bench_decode(cfg, "decode_tokens_per_sec_int4_qwen3_14b_b16_one_chip",
                  quant_bits=4, quant_direct=True, NEW=64)


def bench_decode_14b_int4_pairs():
    """Same 14B one-chip decode with the OPT-IN bf16-pair int4 packing
    (`quantize_params(int4_format="pairs")`): the kernel bit-constructs two
    bf16 weights per shr+and+or+bitcast pass instead of arithmetic
    converts — measured +5.2% over the exact default plane format, at the
    cost of a non-bit-exact fp32 epilogue bias correction
    (kernels/quant_matmul.py pairs section documents the tradeoff)."""
    from prot2text_tpu.models.qwen3 import Qwen3Config

    cfg = Qwen3Config.qwen3_14b().core()
    _bench_decode(cfg,
                  "decode_tokens_per_sec_int4pairs_qwen3_14b_b16_one_chip",
                  quant_bits=4, quant_direct=True, NEW=64,
                  int4_format="pairs")


def bench_decode_8b_int8_b128():
    """Throughput-serving configuration: same 8B int8 one-chip setup at
    B=128.  Measured (scripts/bench_quant_matmul.py probes): the decode
    matmul step time is FLAT in batch up to B≈128 — the floor is the MXU
    weight-load rate, not activation rows — so bigger serving batches are
    nearly free tokens/s until KV-cache reads start to dominate
    (measured: B16→64→128→192 gives 1115→2459→2907→3040 tok/s; saturating).
    KV cache at B=128, T=192 ≈ 3.2 GB — still one 16 GB chip."""
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_1_8b().core()
    _bench_decode(cfg, "decode_tokens_per_sec_int8_llama31_8b_b128_one_chip",
                  quant_bits=8, quant_direct=True, B=128, NEW=64)


def bench_decode_8b_int8_kv8_b128():
    """B=128 + int8 KV cache (kv_bits=8): the decode step is weights (MXU
    floor) + attention cache read (HBM floor) — the int8 cache halves the
    read bytes of the second term (~4 ms of the 18.7 ms step at T=192)
    and the fused Pallas kernel (decode_attention_stacked_write_q) folds
    the dequant + the quantized slot write in.  ~0.4% logit RMS error
    (tests/test_kv_quant.py)."""
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_1_8b().core()
    _bench_decode(cfg,
                  "decode_tokens_per_sec_int8_kv8_llama31_8b_b128_one_chip",
                  quant_bits=8, quant_direct=True, B=128, NEW=64, kv_bits=8)


def bench_decode_8b_int8_kv8_b256():
    """HEADLINE (round 4): the B-scaling sweep (scripts/bench_decode_bscale
    .py, r4 measured) showed the B=128 step still had batch headroom —
    B=128 6917 / B=192 7353 / B=256-kv8 7712 / B=320-kv8 7742 tok/s
    (saturated; B=256 bf16-KV and B=384 kv8 OOM at compile).  B=256 with
    the int8 KV pool is the best one-chip serving configuration: +11.5%
    over the old B=128 headline at a safer footprint than B=320."""
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_1_8b().core()
    _bench_decode(cfg,
                  "decode_tokens_per_sec_int8_kv8_llama31_8b_b256_one_chip",
                  quant_bits=8, quant_direct=True, B=256, NEW=64, kv_bits=8)


def bench_serving_continuous():
    """Continuous batching (infer/serving.py) on a ragged workload:
    16 requests, budgets cycling 16..64 new tokens, 8 slots, 1B int8.
    Useful-token throughput vs the lockstep estimate (every request padded
    to the longest budget, the reference's static-batch behavior) computed
    from THIS run's decode rate — greedy outputs are token-identical to
    generate() (tests/test_serving.py)."""
    from prot2text_tpu.infer.serving import ContinuousBatcher
    from prot2text_tpu.models.decoder import init_decoder_params
    from prot2text_tpu.models.llama import LlamaConfig
    from prot2text_tpu.models.quant import quantize_params

    cfg = LlamaConfig.llama_3_2_1b().core()
    params = quantize_params(
        init_decoder_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16),
        bits=8)
    SLOTS, PAD = 8, 128
    budgets = [16 + 8 * (i % 7) for i in range(16)]       # 16..64 ragged
    rng = np.random.default_rng(0)
    prompts = [rng.standard_normal(
        (64 + (i * 13) % 65, cfg.hidden_size)).astype(np.float32)
        for i in range(16)]

    def serve(n_requests):
        eng = ContinuousBatcher(cfg, params, max_slots=SLOTS,
                                max_len=PAD + 64, prompt_pad=PAD,
                                eos_token_id=-1, sync_every=8)
        for i, (emb, n) in enumerate(zip(prompts[:n_requests],
                                         budgets[:n_requests])):
            eng.submit(i, emb, max_new_tokens=n)
        out = dict(eng.run())
        return eng.steps, sum(len(v) for v in out.values())

    serve(len(budgets))   # full-workload warmup: compiles every
    t0 = time.perf_counter()                  # (install-rows,) bucket seen
    steps, useful = serve(len(budgets))
    dt = time.perf_counter() - t0
    # lockstep: every request decodes to the round's max budget
    lockstep_steps = sum(
        max(budgets[i:i + SLOTS]) for i in range(0, len(budgets), SLOTS))
    _emit("serving_continuous_tokens_per_sec_int8_llama32_1b_8slots",
          useful / dt, "tokens/s",
          decode_steps=steps, lockstep_steps=lockstep_steps,
          step_reduction=round(1 - steps / lockstep_steps, 3),
          requests=len(budgets), useful_tokens=useful)


def bench_sft_flagship():
    """FLAGSHIP-scale stage-2 SFT (VERDICT r2 #5a): QLoRA over the frozen
    instruct flagship — esmc_600m (bf16) + Llama-3.1-8B (int8 weight-only,
    README.md:17-19 scale) with LoRA r=32 on the reference target set and
    the trainable adapter, one jitted step at the reference stage-2 shape
    (batch 1/device, train_instruct.py:59-69; grad-accum shortened 32→4 to
    keep the metric inside the bench budget — time is linear in accum)."""
    from prot2text_tpu.models.adapters import (
        ModalityAdapterConfig, init_modality_adapter_params)
    from prot2text_tpu.models.esmc import ESMCConfig, init_esmc_params
    from prot2text_tpu.models.llama import LlamaConfig
    from prot2text_tpu.models.lora import LoraConfig, init_lora_params
    from prot2text_tpu.train.optim import TrainState, adamw_constant
    from prot2text_tpu.train.sft import SFTConfig, make_sft_train_step

    enc_cfg = ESMCConfig.esmc_600m()
    dec_cfg = LlamaConfig.llama_3_1_8b().core()
    PLACEHOLDER = 128003
    ad_cfg = ModalityAdapterConfig(enc_cfg.d_model, 2048, dec_cfg.hidden_size)
    frozen = {
        "esm_encoder": init_esmc_params(enc_cfg, jax.random.PRNGKey(0),
                                        jnp.bfloat16),
        "llm_decoder": _init_quantized_random(dec_cfg, bits=8),
        "adapter": init_modality_adapter_params(ad_cfg, jax.random.PRNGKey(1),
                                                jnp.bfloat16),
    }
    lora_cfg = LoraConfig(r=32, alpha=64)
    trainable = {
        "lora_esm": init_lora_params(lora_cfg, frozen["esm_encoder"],
                                     jax.random.PRNGKey(2), jnp.bfloat16),
        "lora_llm": init_lora_params(lora_cfg, frozen["llm_decoder"],
                                     jax.random.PRNGKey(3), jnp.bfloat16),
        "adapter": frozen["adapter"],
    }
    tx = adamw_constant(2e-4)
    state = TrainState.create(trainable, tx)
    step = jax.jit(make_sft_train_step(
        esm_config=enc_cfg, adapter_config=ad_cfg, decoder_core=dec_cfg,
        cfg=SFTConfig(lora=lora_cfg, placeholder_id=PLACEHOLDER, remat=True),
        tx=tx, grad_accum=4), donate_argnums=(0,))

    B, GA, PROT, S = 1, 4, 510, 1024
    rng = np.random.default_rng(0)
    ids = np.full((GA, B, S), 11, np.int64)
    labels = np.full((GA, B, S), -100, np.int64)
    # chat layout: [prompt 448 ‖ placeholders 512 ‖ description 64...]
    ids[:, :, 448:448 + PROT + 2] = PLACEHOLDER
    desc = rng.integers(0, 128000, (GA, B, S - (448 + PROT + 2)))
    ids[:, :, 448 + PROT + 2:] = desc
    labels[:, :, 448 + PROT + 2:] = desc
    batch = {
        "protein_input_ids": jnp.asarray(
            rng.integers(4, 24, (GA, B, PROT + 2)), jnp.int32),
        "protein_attention_mask": jnp.ones((GA, B, PROT + 2), jnp.int32),
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((GA, B, S), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }

    def run():
        nonlocal state
        state, loss = step(state, frozen, batch, jax.random.PRNGKey(0))
        return float(loss)

    dt = _time(run)
    n_params = _param_count(frozen["llm_decoder"])
    tokens = B * GA * S
    # frozen-base LoRA: ~2P fwd + 2P dx-bwd + 2P remat-replay per token
    mfu = 6.0 * n_params * tokens / dt / V5E_BF16_PEAK_FLOPS
    _emit("sft_train_tokens_per_sec_qlora_esmc600m_llama8b_int8",
          tokens / dt, "tokens/s", mfu=round(mfu, 4),
          step_ms=round(dt * 1e3, 1), params_m=round(n_params / 1e6, 1),
          batch=B, grad_accum=GA, seq_len=S, lora_r=32)


def bench_sft_flagship_14b(bits: int = 4):
    """REFERENCE-SCALE stage-2 SFT (VERDICT r4 #1): QLoRA over the frozen
    ESMC arc at the reference's actual scale — esmc_600m (bf16) +
    **Qwen3-14B** (reference train_instruct.py:87-94), LoRA r=32, batch 1,
    S=1024 (grad-accum shortened 32→4 for the bench budget; time is linear
    in accum).  The frozen base is int4 nibble-plane packed (7.4 GB — the
    packing that fits beside ESMC + activations on a 16 GB chip; an int8
    base is ~13.9 GB of weights alone and OOMs with the fp32 logits +
    remat residuals, recorded in TODO.md)."""
    from prot2text_tpu.models.adapters import (
        ModalityAdapterConfig, init_modality_adapter_params)
    from prot2text_tpu.models.esmc import ESMCConfig, init_esmc_params
    from prot2text_tpu.models.lora import LoraConfig, init_lora_params
    from prot2text_tpu.models.qwen3 import Qwen3Config
    from prot2text_tpu.train.optim import TrainState, adamw_constant
    from prot2text_tpu.train.sft import SFTConfig, make_sft_train_step

    enc_cfg = ESMCConfig.esmc_600m()
    dec_cfg = Qwen3Config.qwen3_14b().core()
    PLACEHOLDER = 151669
    ad_cfg = ModalityAdapterConfig(enc_cfg.d_model, 2048, dec_cfg.hidden_size)
    frozen = {
        "esm_encoder": init_esmc_params(enc_cfg, jax.random.PRNGKey(0),
                                        jnp.bfloat16),
        "llm_decoder": _init_quantized_random(dec_cfg, bits=bits),
        "adapter": init_modality_adapter_params(ad_cfg, jax.random.PRNGKey(1),
                                                jnp.bfloat16),
    }
    lora_cfg = LoraConfig(r=32, alpha=64)
    trainable = {
        "lora_esm": init_lora_params(lora_cfg, frozen["esm_encoder"],
                                     jax.random.PRNGKey(2), jnp.bfloat16),
        "lora_llm": init_lora_params(lora_cfg, frozen["llm_decoder"],
                                     jax.random.PRNGKey(3), jnp.bfloat16),
        "adapter": frozen["adapter"],
    }
    tx = adamw_constant(2e-4)
    state = TrainState.create(trainable, tx)
    step = jax.jit(make_sft_train_step(
        esm_config=enc_cfg, adapter_config=ad_cfg, decoder_core=dec_cfg,
        cfg=SFTConfig(lora=lora_cfg, placeholder_id=PLACEHOLDER, remat=True),
        tx=tx, grad_accum=4), donate_argnums=(0,))

    B, GA, PROT, S = 1, 4, 510, 1024
    rng = np.random.default_rng(0)
    ids = np.full((GA, B, S), 11, np.int64)
    labels = np.full((GA, B, S), -100, np.int64)
    ids[:, :, 448:448 + PROT + 2] = PLACEHOLDER
    desc = rng.integers(0, 151000, (GA, B, S - (448 + PROT + 2)))
    ids[:, :, 448 + PROT + 2:] = desc
    labels[:, :, 448 + PROT + 2:] = desc
    batch = {
        "protein_input_ids": jnp.asarray(
            rng.integers(4, 24, (GA, B, PROT + 2)), jnp.int32),
        "protein_attention_mask": jnp.ones((GA, B, PROT + 2), jnp.int32),
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((GA, B, S), jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
    }

    def run():
        nonlocal state
        state, loss = step(state, frozen, batch, jax.random.PRNGKey(0))
        return float(loss)

    dt = _time(run)
    n_params = _param_count(frozen["llm_decoder"])
    tokens = B * GA * S
    # frozen-base LoRA: ~2P fwd + 2P dx-bwd + 2P remat-replay per token
    mfu = 6.0 * n_params * tokens / dt / V5E_BF16_PEAK_FLOPS
    _emit(f"sft_train_tokens_per_sec_qlora_esmc600m_qwen3_14b_int{bits}",
          tokens / dt, "tokens/s", mfu=round(mfu, 4),
          step_ms=round(dt * 1e3, 1), params_m=round(n_params / 1e6, 1),
          batch=B, grad_accum=GA, seq_len=S, lora_r=32)


def bench_contrastive_flagship(tower_dtype: str = "bf16"):
    """FLAGSHIP-scale stage-1 contrastive (VERDICT r2 #5b): the reference's
    actual config — esmc_600m + Qwen3-14B text tower truncated at layer 16
    (train_contrast.py:117-195, :288).  Only the 16 scanned layers exist on
    device (int8 weight-only ≈ 5.3 GB + bf16 embeddings), matching the
    truncated-tower design; B=8, grad-accum shortened 8→2 for the bench
    budget (time is linear in accum)."""
    from prot2text_tpu.models.adapters import (
        ModalityAdapterConfig, init_modality_adapter_params)
    from prot2text_tpu.models.esmc import ESMCConfig, init_esmc_params
    from prot2text_tpu.models.qwen3 import Qwen3Config
    from prot2text_tpu.train.contrastive import (
        ContrastiveConfig, make_contrastive_train_step)
    from prot2text_tpu.train.optim import adamw_constant
    from prot2text_tpu.train.sft import TrainState

    enc_cfg = ESMCConfig.esmc_600m()
    full = Qwen3Config.qwen3_14b()
    tower = type(full.core())(**{**full.core().__dict__, "num_layers": 16})
    ad_cfg = ModalityAdapterConfig(enc_cfg.d_model, 2048, tower.hidden_size)
    if tower_dtype == "bf16":
        # reference-exact numerics (train_contrast.py:92 runs the Qwen
        # tower bf16): 16 bf16 layers + embeddings; the lm_head is dropped
        # — contrastive reads hidden states at layer 16, never logits —
        # which is what makes the bf16 tower fit one chip at all
        tower_params = _init_bf16_random_decoder(tower, drop_lm_head=True)
    else:
        tower_params = _init_quantized_random(tower, bits=8)
    frozen = {
        "esm_encoder": init_esmc_params(enc_cfg, jax.random.PRNGKey(0),
                                        jnp.bfloat16),
        "llm_decoder": tower_params,
    }
    adapter = init_modality_adapter_params(ad_cfg, jax.random.PRNGKey(2),
                                           jnp.bfloat16)
    tx = adamw_constant(2e-4)
    state = TrainState.create(adapter, tx)
    ccfg = ContrastiveConfig(output_llm_layer=16)
    B, GA, PROT, DESC = 8, 2, 512, 256
    rng = np.random.default_rng(0)
    batch = {
        "protein_input_ids": jnp.asarray(
            rng.integers(4, 24, (GA, B, PROT)), jnp.int32),
        "protein_attention_mask": jnp.ones((GA, B, PROT), jnp.int32),
        "description_input_ids": jnp.asarray(
            rng.integers(0, 151000, (GA, B, DESC)), jnp.int32),
        "description_attention_mask": jnp.ones((GA, B, DESC), jnp.int32),
    }
    step = jax.jit(make_contrastive_train_step(
        esm_config=enc_cfg, adapter_config=ad_cfg, decoder_core=tower,
        cfg=ccfg, tx=tx, grad_accum=GA, deterministic=True),
        donate_argnums=(0,))

    def run():
        nonlocal state
        state, loss = step(state, frozen, batch, jax.random.PRNGKey(0))
        return float(loss)

    dt = _time(run)
    _emit(f"contrastive_pairs_per_sec_esmc600m_qwen3_14b_l16_{tower_dtype}",
          B * GA / dt, "pairs/s", step_ms=round(dt * 1e3, 1), batch=B,
          grad_accum=GA, protein_len=PROT, desc_len=DESC, tower_layers=16)


def _bench_serving_flagship(name, kv_bits=None, slots=8,
                            prompt_lookup_tokens=0, buckets=None,
                            shared_prefix=0, prefix_dedup=False,
                            dedup_slots=None, n_req=24, ab=True):
    """FLAGSHIP-scale continuous batching (VERDICT r2 #6): the 8B int8
    one-chip serving config under a PRODUCTION workload shape — ragged
    prompts up to the real ~1.6k-token chat context (SURVEY.md §5 input
    budget), prompt_pad length buckets, ragged decode budgets.
    kv_bits=8 serves from the int8 KV pool, whose halved cache bytes are
    exactly what buys a 16-slot pool: bf16 KV at 16x1888 is ~4 GB and
    OOMs next to the 8.5 GB weights, int8 fits.  Slot sweep (round 3,
    kv8 + device submit, N=24): 8 slots 250 tok/s, 16 slots 277 (+11% —
    per-row cache reads grow with the pool, so slots saturate rather
    than scale).  Bucket granularity is the dominant end-to-end lever at
    this workload: the coarse (512, 1664) ladder pads 33,024 prefill
    tokens against 20,556 real ones, and prefill compute dominates the
    run — the 7-bucket ladder measured 526 vs 334 useful tok/s (+58%)
    on the spec-kv8-16-slot config (scripts/bench_serving_buckets.py)."""
    from prot2text_tpu.infer.serving import ContinuousBatcher
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.llama_3_1_8b().core()
    params = _init_quantized_random(cfg, bits=8)
    SLOTS = slots
    BUCKETS = (buckets if buckets is not None
               else (384, 512, 768, 1024, 1280, 1408, 1664))
    MAXNEW = 192
    N_REQ = n_req
    rng = np.random.default_rng(0)
    if shared_prefix:
        # real chat workload shape: every prompt = the shared-prefix
        # system+template header + a private suffix; totals 600..1600
        plens = [600 + (i * 331) % 1000 for i in range(N_REQ)]
    else:
        plens = [300 + (i * 331) % 1300 for i in range(N_REQ)]  # 300..1600
    budgets = [64 + 32 * (i % 5) for i in range(N_REQ)]      # 64..192
    # DEVICE-resident prompts (the engine's device-submit path): in
    # production the prompt embeddings come out of the encoder+adapter on
    # device — serving must not pay a host round-trip per request (the np
    # submit path measured ~3x slower end-to-end under remote dispatch)
    prefix_np = (rng.standard_normal((shared_prefix, cfg.hidden_size))
                 .astype(np.float32) if shared_prefix else None)
    prefix_dev = (jax.device_put(jnp.asarray(prefix_np, jnp.bfloat16))
                  if shared_prefix else None)

    def padded(arr, plen):
        pad = next(b for b in BUCKETS if plen <= b)
        e = np.zeros((pad, cfg.hidden_size), np.float32)
        e[pad - plen:] = arr
        return jax.device_put(jnp.asarray(e, jnp.bfloat16))

    prompts, suffixes = [], []
    for i, p in enumerate(plens):
        full = rng.standard_normal((p, cfg.hidden_size)).astype(np.float32)
        if shared_prefix:
            full[:shared_prefix] = prefix_np
            suffixes.append(padded(full[shared_prefix:], p - shared_prefix))
        if not prefix_dedup:
            # the dedup A/B never submits full prompts (whose lengths can
            # exceed a suffix-sized bucket ladder)
            prompts.append(padded(full, p))

    def serve(n, use_prefix=False, dedup=False, n_slots=None):
        eng = ContinuousBatcher(
            cfg, params, max_slots=n_slots or SLOTS,
            max_len=BUCKETS[-1] + MAXNEW,
            prompt_pad=BUCKETS, eos_token_id=-1, sync_every=16,
            kv_bits=kv_bits, prompt_lookup_tokens=prompt_lookup_tokens,
            shared_prefix_embeds=prefix_dev if use_prefix else None,
            prefix_dedup=dedup)
        for i in range(n):
            if use_prefix:
                eng.submit(i, suffixes[i], max_new_tokens=budgets[i],
                           prompt_len=plens[i] - shared_prefix)
            else:
                eng.submit(i, prompts[i], max_new_tokens=budgets[i],
                           prompt_len=plens[i])
        out = dict(eng.run())
        return eng.steps, sum(len(v) for v in out.values())

    def timed(use_prefix=False, dedup=False, n_slots=None):
        # warmup on the FULL workload: the prefill compiles per
        # (install-rows, prompt-bucket) pair actually seen (serving.py),
        # and the deterministic greedy run hits the same pairs both times
        serve(len(plens), use_prefix, dedup, n_slots)
        t0 = time.perf_counter()
        steps, useful = serve(len(plens), use_prefix, dedup, n_slots)
        return steps, useful, time.perf_counter() - t0

    extras = {}
    if shared_prefix and prefix_dedup and not ab:
        # dedup-only timing (no replicated A/B): the deep-queue metric
        # reuses the 24-request A/B from bench_serving_flagship_prefix
        steps, useful, dt = timed(use_prefix=True, dedup=True,
                                  n_slots=dedup_slots or SLOTS)
        extras["dedup_slots"] = dedup_slots or SLOTS
        extras["shared_prefix_tokens"] = shared_prefix
    elif shared_prefix and prefix_dedup:
        # same-workload A/B: replicated prefix at SLOTS vs DEDUP at
        # dedup_slots — the HBM freed by storing the prefix once (~0.5 GB
        # at 16 slots x 512 kv8) converted into pool capacity
        # (scripts/bench_serving_prefix_dedup.py: 400 -> 491 tok/s)
        _, useful_r, dt_r = timed(use_prefix=True)
        extras["replicated_tokens_per_sec"] = round(useful_r / dt_r, 1)
        extras["replicated_slots"] = SLOTS
        extras["shared_prefix_tokens"] = shared_prefix
        steps, useful, dt = timed(use_prefix=True, dedup=True,
                                  n_slots=dedup_slots or SLOTS)
        extras["dedup_slots"] = dedup_slots or SLOTS
        extras["dedup_speedup"] = round((useful / dt) / (useful_r / dt_r),
                                        3)
    elif shared_prefix:
        # same-workload A/B: full-prompt prefill vs prefix-shared prefill
        _, useful_np, dt_np = timed(use_prefix=False)
        extras["no_prefix_tokens_per_sec"] = round(useful_np / dt_np, 1)
        extras["shared_prefix_tokens"] = shared_prefix
        steps, useful, dt = timed(use_prefix=True)
        extras["prefix_speedup"] = round((useful / dt) / (useful_np / dt_np),
                                         3)
    else:
        steps, useful, dt = timed()
    lockstep_steps = sum(
        max(budgets[i:i + SLOTS]) for i in range(0, len(budgets), SLOTS))
    _emit(name,
          useful / dt, "tokens/s", decode_steps=steps,
          lockstep_steps=lockstep_steps,
          step_reduction=round(1 - steps / lockstep_steps, 3),
          requests=len(plens), useful_tokens=useful,
          prompt_buckets=list(BUCKETS), **extras)


def bench_serving_flagship():
    _bench_serving_flagship(
        "serving_continuous_tokens_per_sec_int8_llama31_8b_8slots_1664ctx")


def bench_serving_flagship_kv8():
    _bench_serving_flagship(
        "serving_continuous_tokens_per_sec_int8_kv8_llama31_8b_16slots_1664ctx",
        kv_bits=8, slots=16)


def bench_serving_flagship_spec():
    """Speculative serving (per-row prompt-lookup drafts + the fused Pallas
    chunk-verify kernel, kernels/decode_attention.py
    decode_attention_stacked_verify_qc) on the same kv8 16-slot flagship
    workload.  Random-weight greedy streams loop, so draft acceptance here
    is near the UPPER BOUND — treat this as the high-acceptance regime
    (repetitive outputs); low-acceptance streams degrade toward ~1 token
    per verify round.  Measured A/B vs plain: 331.9 vs ~278 tok/s at the
    coarse (512, 1664) bucket ladder, 526.5 tok/s at the fine 7-bucket
    default (scripts/bench_serving_buckets.py), with 4.4x fewer decode
    steps; the fused verify round costs 21.9 ms vs 15.85 ms for a
    single-token step (scripts/bench_spec_floor.py)."""
    _bench_serving_flagship(
        "serving_spec_tokens_per_sec_int8_kv8_llama31_8b_16slots_1664ctx",
        kv_bits=8, slots=16, prompt_lookup_tokens=4)


def bench_serving_flagship_prefix():
    """Prefix-shared KV serving with HBM DEDUP (infer/serving.py
    prefix_dedup=True) on the kv8 speculative flagship: every request
    shares a 512-token system+template header whose KV is computed once,
    stored ONCE, and read by the fused decode/verify kernels as a
    batch-broadcast constant-index operand (fetched once per layer, not
    once per slot).  The ~0.5 GB the 16-slot replicated layout spent on
    prefix copies buys a 24-SLOT pool at 25% LESS footprint — measured
    (scripts/bench_serving_prefix_dedup.py): replicated_16 400.2 /
    replicated_24 456.7 / dedup_24 491.1 useful tok/s (+7.5% at equal
    slots, +23% vs the round-3 16-slot config).  The prefix-vs-full-
    prompt prefill A/B (+19%) is round 3's no_prefix_tokens_per_sec,
    recorded in REPORT_r3.md."""
    _bench_serving_flagship(
        "serving_prefix_dedup_tokens_per_sec_int8_kv8_llama31_8b_24slots",
        kv_bits=8, slots=16, prompt_lookup_tokens=4, shared_prefix=512,
        prefix_dedup=True, dedup_slots=24,
        buckets=(384, 512, 768, 1024, 1280))


def bench_serving_flagship_deepq():
    """Deep-queue serving (round-4 probe promoted to a metric): the
    kv8 speculative prefix-dedup flagship with a 64-REQUEST queue at the
    24-slot one-chip ceiling.  Measured (scripts/bench_serving_deep_queue
    .py, r4): 539.8 useful tok/s — the deeper queue alone lifts the
    24-slot config +10% over the 24-request workload (the shallow queue
    spent ~1/3 of its span in ramp-down); 32/40 slots ResourceExhausted,
    so 24 slots IS the ceiling at this context length.  r5: 553.1 on a
    warm cache (122 s wall including compile) — promoted into the
    critical group (VERDICT r4 #4) as the serving representative."""
    _bench_serving_flagship(
        "serving_deepq_tokens_per_sec_int8_kv8_llama31_8b_24slots_64req",
        kv_bits=8, slots=16, prompt_lookup_tokens=4, shared_prefix=512,
        prefix_dedup=True, dedup_slots=24,
        buckets=(384, 512, 768, 1024, 1280), n_req=64, ab=False)


def bench_contrastive_step():
    """BASELINE.json named metric: contrastive pairs/sec/chip.  Stage-1
    alignment step (frozen esmc_300m + frozen Llama-1B layer-16 text tower
    + trainable adapter, InfoNCE over the batch — train_contrast.py
    defaults: B=8/device, grad-accum 8, bf16) as ONE jitted step."""
    from prot2text_tpu.models.adapters import (
        ModalityAdapterConfig, init_modality_adapter_params)
    from prot2text_tpu.models.esmc import ESMCConfig, init_esmc_params
    from prot2text_tpu.models.llama import LlamaConfig
    from prot2text_tpu.models.decoder import init_decoder_params
    from prot2text_tpu.train.contrastive import (
        ContrastiveConfig, make_contrastive_train_step)
    from prot2text_tpu.train.optim import adamw_constant
    from prot2text_tpu.train.sft import TrainState

    enc_cfg = ESMCConfig.esmc_300m()
    dec_cfg = LlamaConfig.llama_3_2_1b().core()
    ad_cfg = ModalityAdapterConfig(enc_cfg.d_model, 2048, dec_cfg.hidden_size)
    frozen = {
        "esm_encoder": init_esmc_params(enc_cfg, jax.random.PRNGKey(0),
                                        jnp.bfloat16),
        "llm_decoder": init_decoder_params(dec_cfg, jax.random.PRNGKey(1),
                                           jnp.bfloat16),
    }
    adapter = init_modality_adapter_params(ad_cfg, jax.random.PRNGKey(2),
                                           jnp.bfloat16)
    tx = adamw_constant(2e-4)
    state = TrainState.create(adapter, tx)
    ccfg = ContrastiveConfig()
    B, GA, PROT, DESC = 8, 8, 512, 128        # reference defaults
    rng = np.random.default_rng(0)
    batch = {
        "protein_input_ids": jnp.asarray(
            rng.integers(4, 24, (GA, B, PROT)), jnp.int32),
        "protein_attention_mask": jnp.ones((GA, B, PROT), jnp.int32),
        "description_input_ids": jnp.asarray(
            rng.integers(0, 32000, (GA, B, DESC)), jnp.int32),
        "description_attention_mask": jnp.ones((GA, B, DESC), jnp.int32),
    }
    step = jax.jit(make_contrastive_train_step(
        esm_config=enc_cfg, adapter_config=ad_cfg, decoder_core=dec_cfg,
        cfg=ccfg, tx=tx, grad_accum=GA, deterministic=True))

    def run():
        nonlocal state
        state, loss = step(state, frozen, batch, jax.random.PRNGKey(0))
        return float(loss)

    dt = _time(run)
    _emit("contrastive_pairs_per_sec_esmc300m_llama1b_b8x8", B * GA / dt,
          "pairs/s", step_ms=round(dt * 1e3, 1), batch=B, grad_accum=GA,
          protein_len=PROT, desc_len=DESC)


def bench_descriptions_per_hour():
    """BASELINE.md north-star proxy: end-to-end protein→description at the
    reference's ESMC-Qwen flagship scale (esmc_600m encoder + adapter +
    Qwen3-14B int4 decoder, esmc_qwen_arc.py:208) on ONE 16 GB chip.
    One batch = encoder forward + adapter + prefill + 256 greedy tokens —
    the full per-description latency.  B=48 with the int8 KV cache is the
    measured one-chip sweet spot (scripts/bench_desc_hour.py sweep:
    B=8 bf16 4583, B=16 bf16 8701, B=24 bf16 10366, B=32 kv8 12815,
    B=40 kv8 13696, B=48 kv8 15054 desc/h; B=56 OOMs) — the 14B int4
    decode step is weights-streaming bound, so batch rows are nearly free
    until HBM runs out.  B>32 needs attn_impl="auto": the prefill routes
    through the query-chunked XLA attention (kernels/attention.py
    _xla_attention_chunked), which bounds the fp32 scores transient that
    OOM'd the unchunked prefill at B=40.  Random weights (zero-egress
    container); throughput does not depend on values.  The reference
    publishes no A6000 number to compare against (BASELINE.md)."""
    from prot2text_tpu.infer.generate import GenerationConfig, generate
    from prot2text_tpu.models.adapters import (
        ModalityAdapterConfig, init_modality_adapter_params, modality_adapter)
    from prot2text_tpu.models.esmc import (
        ESMCConfig, esmc_encode, init_esmc_params)
    from prot2text_tpu.models.qwen3 import Qwen3Config

    B, PROT, NEW = 48, 512, 256
    enc_cfg = ESMCConfig.esmc_600m()
    dec_cfg = Qwen3Config.qwen3_14b().core()
    enc_params = init_esmc_params(enc_cfg, jax.random.PRNGKey(0),
                                  jnp.bfloat16)
    ad_cfg = ModalityAdapterConfig(enc_cfg.d_model, 2048, dec_cfg.hidden_size)
    ad_params = init_modality_adapter_params(ad_cfg, jax.random.PRNGKey(1),
                                             jnp.bfloat16)
    dec_params = _init_quantized_random(dec_cfg, bits=4)
    rng = np.random.default_rng(0)
    prot_ids = jnp.asarray(rng.integers(4, 24, (B, PROT)), jnp.int32)
    prot_mask = jnp.ones((B, PROT), jnp.int32)
    text_emb = jnp.asarray(rng.standard_normal((B, 32, dec_cfg.hidden_size)),
                           jnp.bfloat16)
    gen_cfg = GenerationConfig(max_new_tokens=NEW, eos_token_id=-1,
                               pad_token_id=0)

    def run():
        enc = esmc_encode(enc_cfg, enc_params, prot_ids, prot_mask)
        adapted = modality_adapter(ad_cfg, ad_params, enc,
                                   deterministic=True)
        emb = jnp.concatenate([adapted.astype(jnp.bfloat16), text_emb],
                              axis=1)
        mask = jnp.ones((B, emb.shape[1]), jnp.int32)
        toks = generate(dec_cfg, dec_params, inputs_embeds=emb,
                        attention_mask=mask, gen_cfg=gen_cfg,
                        attn_impl="auto", cache_dtype=jnp.bfloat16,
                        kv_bits=8)
        return np.asarray(toks)

    dt = _time(run, iters=1)
    _emit("descriptions_per_hour_esmc600m_qwen3_14b_int4_one_chip",
          B * 3600 / dt, "descriptions/h",
          batch=B, new_tokens=NEW, protein_len=PROT, kv_bits=8,
          batch_seconds=round(dt, 2))


# Run order IS priority order (round-2 lesson: the driver's outer timeout
# killed the run after 8 of 10 metrics and took out the BASELINE.md named
# metrics + the intended headline).  The headline runs FIRST and its line is
# RE-EMITTED after every later metric, so the driver-parsed LAST stdout line
# is always the headline no matter where an outer timeout lands.
#
# Round-4 (VERDICT r3 #1/#4): descriptions_per_hour — the BASELINE.md
# north star, which has missed the driver artifact three rounds running —
# is priority #2, and the stage-1 FLAGSHIP contrastive config (esmc600m +
# Qwen3-14B L16, the reference's actual train_contrast.py:117-195 setup)
# replaces the 300m/1b continuity number in the critical set.
HEADLINE = "bench_decode_8b_int8_kv8_b256"
METRICS = (
    # -- critical five: headline + the three BASELINE.md named metrics
    # -- + the serving-engine representative ------------------------------
    "bench_decode_8b_int8_kv8_b256",  # headline: best one-chip serving
    "bench_descriptions_per_hour",    # BASELINE: north-star proxy
    "bench_contrastive_flagship",     # BASELINE: stage-1 flagship pairs/s
    "bench_decode_8b_int8",           # BASELINE: decode tokens/s
    "bench_serving_flagship_deepq",   # serving engine representative (r5:
                                      # subsumes kv8+spec+prefix-dedup;
                                      # streams 5th in the group phase, so
                                      # the original four never wait on it)
    # -- flagship-scale secondary metrics ---------------------------------
    "bench_decode_8b_int8_b128",      # round-3 headline continuity
    "bench_decode_8b_int8_kv8_b128",
    "bench_decode_14b_int4",
    "bench_decode_14b_int4_pairs",
    "bench_contrastive_step",         # 300m/1b continuity config
    "bench_sft_flagship",
    "bench_sft_flagship_14b",          # reference stage-2 scale (r5)
    "bench_serving_flagship",
    "bench_serving_flagship_kv8",
    "bench_serving_flagship_spec",
    "bench_serving_flagship_prefix",
    "bench_serving_continuous",
    "bench_sft_step",
    # -- small-model continuity metrics (skipped first under pressure) ----
    "bench_decode_flagship_int8",
    "bench_decode_flagship",
    "bench_decode_toy",
)
N_CRITICAL = 5
# per-metric timeout overrides for the individual-attempt phase: metrics
# whose INIT alone exceeds the fail-fast window even warm (the 14B SFT
# builds 7.4 GB of random packed weights through the tunnel: 206 s warm)
SLOW_SECONDARIES = {"bench_sft_flagship_14b": 280.0}


def _run_group(names, timeout_s, inactivity_s, on_line):
    """Run several metrics inside ONE subprocess (`--group a,b,c`), streaming
    stdout so every completed metric's JSON line is captured even if a later
    metric wedges or the group deadline kills the process.  One process for
    the critical set saves ~3× subprocess + dispatch warmup (VERDICT r3
    #1d).  Returns the set of metric names that emitted a line."""
    import subprocess
    import threading

    proc = subprocess.Popen(
        [sys.executable, "-u", __file__, "--group", ",".join(names)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    done, lock = set(), threading.Lock()
    last_line_t = [time.monotonic()]

    def reader():
        # forward each metric line IMMEDIATELY — the driver's outer kill
        # can land mid-group and must only lose the in-flight metric
        for ln in proc.stdout:
            ln = ln.rstrip("\n")
            with lock:
                last_line_t[0] = time.monotonic()
                if ln.startswith("{"):
                    try:
                        done.add(json.loads(ln).get("bench_fn"))
                    except Exception:
                        pass
                    on_line(ln)

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    t0 = time.monotonic()
    while proc.poll() is None:
        now = time.monotonic()
        if now - t0 > timeout_s or now - last_line_t[0] > inactivity_s:
            proc.kill()
            print(f"[bench] group killed at {now - t0:.0f}s "
                  f"(inactive {now - last_line_t[0]:.0f}s)", file=sys.stderr)
            break
        time.sleep(2)
    proc.wait(timeout=15)
    th.join(timeout=5)
    with lock:
        return set(done)


def main():
    """Metrics run in subprocesses with timeouts + retries: the remote-
    execution tunnel occasionally wedges a whole process at dispatch
    (observed ~1-in-4 full runs; individual metrics always recover on a
    fresh process), and a single hang must not zero the other metrics or
    the headline (the driver parses the LAST stdout line).

    A GLOBAL deadline (BENCH_DEADLINE_SECS, default 1200 s — the 2400 s
    round-3 default lost to the driver's outer kill twice: rc=124 in r2
    AND r3) bounds the whole run.  The critical four run in ONE streaming
    subprocess first (one warmup, partial output survives a kill); any
    stragglers retry individually with SHORT fail-fast attempts (a wedged
    dispatch never gets a 450 s window again — VERDICT r3 #1c)."""
    import os

    budget = float(os.environ.get("BENCH_DEADLINE_SECS", "1200"))
    t_start = time.monotonic()
    headline_line = None

    # plumbing-test hook: restrict the run to a comma-list of metric fns
    global METRICS
    only = os.environ.get("BENCH_ONLY_METRICS")
    if only:
        keep = only.split(",")
        METRICS = tuple(n for n in METRICS if n in keep)

    def remaining():
        return budget - (time.monotonic() - t_start)

    # Pre-flight tunnel probe: a wedged remote-execution tunnel (observed
    # lasting tens of minutes to HOURS) would otherwise burn every metric's
    # timeout×retries budget.  A 75 s probe subprocess is ~6× cheaper per
    # attempt than a metric, so wait the wedge out here — up to 30% of the
    # budget — before starting the expensive work.  If the tunnel never
    # answers, proceed anyway: retries remain the last line of defense.
    import subprocess
    while time.monotonic() - t_start < 0.30 * budget:
        try:
            r = subprocess.run(
                [sys.executable, "-u", __file__, "--probe"],
                capture_output=True, text=True, timeout=75)
            if r.returncode == 0 and "probe ok" in r.stdout:
                break
        except subprocess.TimeoutExpired:
            pass
        print(f"[bench] tunnel probe failed at "
              f"{time.monotonic() - t_start:.0f}s; waiting out the wedge",
              file=sys.stderr)
        time.sleep(20)

    landed = {}       # metric name -> value, in landed order (self-cert)

    def emit_line(line):
        # one atomic write; headline re-emitted after every REAL metric so
        # the driver-parsed LAST stdout line is the headline wherever an
        # outer kill lands.  Skip markers do NOT re-emit (VERDICT r4 #2:
        # they buried the tail in duplicates) — the final summary+headline
        # emission below covers last-line parsing for a run that reaches
        # the deadline path.
        nonlocal headline_line
        try:
            rec = json.loads(line)
        except Exception:
            return
        if rec.get("skipped"):
            print(line, flush=True)
            return
        if rec.get("bench_fn") == HEADLINE:
            headline_line = line
        if rec.get("value") is not None:
            landed[rec.get("bench_fn")] = (rec.get("metric"),
                                           rec.get("value"))
        out = line
        if headline_line is not None and line != headline_line:
            out = line + "\n" + headline_line
        print(out, flush=True)

    # Phase 1: the critical four in one streaming subprocess.  Cap the
    # group window so a mid-group wedge still leaves individual-retry
    # budget; inactivity cap bounds a single wedged metric inside it.
    crit = list(METRICS[:N_CRITICAL])
    done = set()
    if remaining() > 360:
        done = _run_group(crit, timeout_s=min(remaining() - 240, 700),
                          inactivity_s=360, on_line=emit_line)
    todo = [n for n in crit if n not in done]
    if todo:
        print(f"[bench] critical stragglers: {todo}", file=sys.stderr)
    if not done and remaining() > 300:
        # The group emitted NOTHING: the tunnel almost certainly wedged
        # AFTER the pre-flight probe passed (observed flapping windows,
        # round 5).  Straggler attempts would each burn their timeout
        # against a dead chip — wait the wedge out again with cheap
        # probes (up to half of what remains) before spending them.
        waited_t0 = time.monotonic()
        while (time.monotonic() - waited_t0) < 0.5 * remaining():
            try:
                r = subprocess.run(
                    [sys.executable, "-u", __file__, "--probe"],
                    capture_output=True, text=True, timeout=75)
                if r.returncode == 0 and "probe ok" in r.stdout:
                    break
            except subprocess.TimeoutExpired:
                pass
            print(f"[bench] mid-run probe failed; waiting out the wedge "
                  f"({remaining():.0f}s left)", file=sys.stderr)
            time.sleep(20)

    # Phase 2: individual subprocesses — critical stragglers first, then
    # the secondary metrics.  Short attempts on the warm .jax_cache; a
    # wedged attempt fails fast and retries on a fresh process.
    for name in todo + list(METRICS[N_CRITICAL:]):
        critical = name in crit
        rem = remaining()
        spent_frac = 1.0 - rem / budget
        if rem < 100 or (not critical and spent_frac > 0.85):
            emit_line(json.dumps(
                {"metric": name, "value": None, "unit": "skipped",
                 "vs_baseline": None, "skipped": True, "bench_fn": name,
                 "reason": "global deadline"}))
            continue
        attempts = 3 if critical else 2
        emitted = False
        for attempt in range(1, attempts + 1):
            rem = remaining()
            if rem < 80:
                break
            # a straggling HEADLINE on a cold .jax_cache can need minutes
            # of compile: give its first attempt one long window before
            # falling back to fail-fast retries (advisor r4)
            if name == HEADLINE and attempt == 1:
                att_timeout = max(240.0, min(450.0, rem - 60))
            else:
                att_timeout = SLOW_SECONDARIES.get(
                    name, 240.0 if critical else 180.0)
            try:
                r = subprocess.run(
                    [sys.executable, "-u", __file__, "--only", name],
                    capture_output=True, text=True,
                    timeout=min(att_timeout, rem - 20))
                out = [ln for ln in r.stdout.splitlines()
                       if ln.startswith("{")]
                if out:
                    emit_line(out[-1])
                    emitted = True
                    break
                print(f"[bench] {name} attempt {attempt}: no output "
                      f"(rc={r.returncode})", file=sys.stderr)
            except subprocess.TimeoutExpired:
                print(f"[bench] {name} attempt {attempt}: timeout",
                      file=sys.stderr)
            # wedge windows pass; retry on a fresh process
            time.sleep(min(20, max(0.0, remaining() - 40)))
        if not emitted:
            # exhausted attempts without a result: leave an explicit
            # marker so the artifact accounts for EVERY metric (an
            # attempts-burned metric used to vanish without trace)
            emit_line(json.dumps(
                {"metric": name, "value": None, "unit": "skipped",
                 "vs_baseline": None, "skipped": True, "bench_fn": name,
                 "reason": "attempts exhausted"}))

    # Self-certification tail (VERDICT r4 #2): ONE compact penultimate
    # summary line with every landed metric's value — critical four first,
    # then METRICS order — so the artifact's recorded tail alone proves
    # which critical metrics landed.  The headline line re-prints LAST for
    # the driver's last-line parse.
    summary = {}
    for name in list(METRICS[:N_CRITICAL]) + list(METRICS[N_CRITICAL:]):
        if name in landed:
            metric, value = landed[name]
            summary[metric] = value
    print(json.dumps({
        # value=None when NOTHING landed (an all-skip wedge run): the
        # driver's last-line parse must see an explicit null, not a zero
        # that reads like a measured throughput of 0
        "metric": "bench_summary",
        "value": (len(summary) if summary else None), "unit": "metrics",
        "vs_baseline": None, "bench_fn": "summary",
        "critical_landed": [n for n in METRICS[:N_CRITICAL] if n in landed],
        "landed": summary,
        "elapsed_s": round(time.monotonic() - t_start, 1)}), flush=True)
    if headline_line is not None:
        print(headline_line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        x = jnp.ones((256, 256), jnp.bfloat16)
        print("probe ok", float(jnp.sum(x @ x)))
        sys.exit(0)
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        _CURRENT_FN = sys.argv[2]
        try:
            globals()[sys.argv[2]]()
        except Exception as e:
            print(f"[bench] {sys.argv[2]} failed: {e}", file=sys.stderr)
            sys.exit(1)
    elif len(sys.argv) > 2 and sys.argv[1] == "--group":
        # several metrics, one process: shared jax init + device warmup;
        # each emits its line as it completes so a kill loses only the
        # in-flight metric.  A failure moves on to the next metric.
        rc = 0
        for fn in sys.argv[2].split(","):
            _CURRENT_FN = fn
            # non-JSON liveness line: resets the parent's inactivity clock
            # at each metric boundary (the parent treats ANY line as alive,
            # JSON lines as results)
            print(f"[bench] start {fn}", flush=True)
            try:
                globals()[fn]()
            except Exception as e:
                print(f"[bench] {fn} failed: {e}", file=sys.stderr)
                rc = 1
            # consecutive flagship metrics share one 16 GB chip: drop the
            # previous metric's device buffers (locals died on return;
            # collect breaks any lingering cycles) before the next init
            import gc

            gc.collect()
        sys.exit(rc)
    else:
        main()
