"""Continuous-batching serving CLI over the CSV-backed light dataset.

Beyond-reference serving surface: same model/checkpoint flags as
generate_instruct_light (merge-and-unload LoRA/PEFT, ESMC+Qwen fusion) but
decoding through `infer.serving.ContinuousBatcher` — a fixed pool of cache
slots where every request advances at its own length and finished slots
refill immediately, so short descriptions never wait for the batch's
longest (the reference's static batches do, generate_instruct.py loop).
Greedy by default (token-identical to generate()); --do_sample enables
the HF warper pipeline (temperature/top-k/top-p) per token.

Output format matches the reference generators: per-host JSON
{name: {"true": ..., "pred": ...}} + descriptions/hour print.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..core.checkpoint import restore_checkpoint
from ..core.dtypes import str2bool
from ..data.collate import Buckets, LightCollator
from ..data.dataset import Prot2TextLightDataset
from ..data.sampler import DataLoader, ShardedSampler
from ..infer.serving import ContinuousBatcher
from ..models.composed import ESMCQwen, ESMCQwenConfig
from ..models.lora import LoraConfig, merge_lora
from .common import (
    add_common_args, setup_platform, shard_model_params, text_tokenizer,
)
from .train_contrast import build_models


def build_parser():
    p = argparse.ArgumentParser("serve")
    add_common_args(p)
    p.add_argument("--test_csv", type=str, required=True)
    p.add_argument("--esm_model", type=str, default="esmc_600m")
    p.add_argument("--llm_model", type=str, default="Qwen/Qwen3-14B")
    p.add_argument("--llm_checkpoint_dir", type=str, default=None)
    p.add_argument("--esm_checkpoint_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--load_sft_checkpoint_dir", type=str, default=None)
    p.add_argument("--load_peft_adapter_dir", type=str, default=None)
    p.add_argument("--lora_rank", type=int, default=32)
    p.add_argument("--max_slots", type=int, default=8,
                   help="concurrent sequences in the serving pool")
    p.add_argument("--sync_every", type=int, default=8,
                   help="decode tokens per host round-trip")
    p.add_argument("--prompt_pad", type=str,
                   default="384,512,768,1024,1280,1408,1664",
                   help="static prefill width, or comma-separated LENGTH "
                        "BUCKETS (e.g. 512,1024,1664): each request "
                        "prefills at the smallest bucket that fits; "
                        "longer prompts are skipped with a warning.  "
                        "Prefill compute dominates ragged-prompt serving, "
                        "so fine buckets pay for their extra compiles "
                        "many times over (a 2-bucket ladder measured 38%% "
                        "of prefill FLOPs as padding and -37%% end-to-end "
                        "useful tok/s at the 8B flagship workload — "
                        "scripts/bench_serving_buckets.py)")
    p.add_argument("--num_workers", type=int, default=0,
                   help="loader worker processes (reference torch num_workers)")
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--do_sample", type=str2bool, default=False)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--max_sequence_length", type=int, default=512)
    p.add_argument("--prompt_lookup_tokens", type=int, default=0,
                   help="speculative serving: n-gram drafts per slot, "
                        "verified per-row (greedy only; 0 = off)")
    p.add_argument("--prompt_lookup_ngram", type=int, default=2)
    p.add_argument("--medusa_path", type=str, default=None,
                   help="npz of trained Medusa draft heads (keys w (K,H,H) "
                        "and b (K,H), cli/train_draft.py) — learned-draft "
                        "speculative serving; exclusive with "
                        "--prompt_lookup_tokens")
    p.add_argument("--spec_break_even", type=float, default=0.0,
                   help="adaptive speculation: fall back to plain decode "
                        "when accepted tokens/verify-round EMA drops below "
                        "this (1.4 ~= the measured 8B verify/step cost "
                        "ratio; 0 = always speculate)")
    p.add_argument("--spec_probe_every", type=int, default=8,
                   help="while falling back, re-probe speculation every N "
                        "plain dispatches")
    p.add_argument("--kv_bits", type=int, default=None,
                   help="8 = int8 KV cache pool (half the decode-attention "
                        "HBM bytes per slot; ~0.4%% logit RMS error)")
    p.add_argument("--shared_prefix", type=str2bool, default=True,
                   help="prefix-shared KV: discover the common chat-template "
                        "token prefix from the first batch, compute its KV "
                        "ONCE, and prefill only each request's private "
                        "suffix (requests are verified token-by-token; "
                        "mismatches fall back to full-prompt prefill — "
                        "greedy output is exact either way)")
    p.add_argument("--prefix_dedup", type=str2bool, default=True,
                   help="store the shared prefix KV ONCE in HBM (batch-"
                        "broadcast kernel operand) instead of replicating "
                        "it into every slot — frees max_slots x prefix "
                        "cache bytes for a bigger pool and reads the "
                        "prefix once per layer instead of once per slot; "
                        "only applies with --shared_prefix")
    p.add_argument("--output_dir", type=str, default="./generation_results")
    p.add_argument("--output_identifier", type=str, default="serve")
    p.add_argument("--debug_trim_generate_split", type=int, default=None)
    p.add_argument("--debug_tiny_model", type=str2bool, default=False)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    mesh = setup_platform(args)
    tok = text_tokenizer(args)

    dataset = Prot2TextLightDataset(args.test_csv)
    if args.debug_trim_generate_split:
        dataset.df = dataset.df.iloc[:args.debug_trim_generate_split]
    placeholder_token = getattr(tok, "placeholder_token",
                                "<|reserved_special_token_1|>")
    collater = LightCollator(
        tokenizer=tok, mode="inference", placeholder_token=placeholder_token,
        name_dropout=0.0, taxonomy_dropout=0.0,
        max_sequence_length=args.max_sequence_length,
        buckets=Buckets(protein=[128, 256, 512, 1024],
                        prompt=[256, 512, 1024, 2048]))
    loader = DataLoader(
        dataset=dataset, collate_fn=collater, batch_size=args.max_slots,
        num_workers=args.num_workers,
        sampler=ShardedSampler(
            len(dataset), num_shards=jax.process_count(),
            shard_index=jax.process_index(), shuffle=False),
        drop_last=False)

    esm_cfg, llm_cfg, adapter_cfg, frozen, adapter = build_models(args, tok)
    if args.load_peft_adapter_dir:
        from ..models.peft_interop import lora_params_from_peft_dir

        lora_tree, lcfg = lora_params_from_peft_dir(
            args.load_peft_adapter_dir, frozen["llm_decoder"])
        frozen["llm_decoder"] = merge_lora(
            lcfg, frozen["llm_decoder"], lora_tree)
    if args.load_sft_checkpoint_dir:
        sft = restore_checkpoint(args.load_sft_checkpoint_dir)
        lora_cfg = LoraConfig(r=args.lora_rank, alpha=2 * args.lora_rank)
        frozen["esm_encoder"] = merge_lora(
            lora_cfg, frozen["esm_encoder"], sft["lora_esm"])
        frozen["llm_decoder"] = merge_lora(
            lora_cfg, frozen["llm_decoder"], sft["lora_llm"])
        adapter = sft["adapter"]

    placeholder_id = getattr(tok, "placeholder_id", 151669)
    cfg = ESMCQwenConfig(esm_config=esm_cfg, adapter_config=adapter_cfg,
                         llm_config=llm_cfg, placeholder_id=placeholder_id)
    params = {"esm_encoder": frozen["esm_encoder"],
              "llm_decoder": frozen["llm_decoder"], "adapter": adapter}
    ntp = dict(mesh.shape).get("tp", 1)
    if ntp > 1:
        # int4 under manual TP: segment-repack row-parallel packed
        # kernels so the packed K dim slices per shard and the stacked
        # Pallas decode/verify kernels stay live (models/quant.py;
        # no-op for bf16/int8 trees)
        from ..models.quant import repack_int4_for_tp

        params["llm_decoder"] = repack_int4_for_tp(
            params["llm_decoder"], ntp)
    params = shard_model_params(mesh, params)

    eos_id = getattr(tok, "eos_token_id", llm_cfg.eos_token_id)
    pad_id = getattr(tok, "pad_token_id", llm_cfg.pad_token_id)
    gen_cfg = None
    if args.do_sample:
        from ..infer.generate import GenerationConfig

        gen_cfg = GenerationConfig(
            do_sample=True, temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, eos_token_id=eos_id, pad_token_id=pad_id)
    medusa_params = None
    if args.medusa_path:
        z = np.load(args.medusa_path)
        # explicit FLOAT compute dtype: args.model_dtype may be int8/int4
        # (build_models happens to rewrite it to bf16 as a side effect, but
        # an int cast here would silently truncate the trained heads)
        mdt = (args.model_dtype
               if jnp.issubdtype(args.model_dtype, jnp.floating)
               else jnp.bfloat16)
        medusa_params = {"w": jnp.asarray(z["w"], mdt),
                         "b": jnp.asarray(z["b"], mdt)}
    buckets = tuple(int(b) for b in str(args.prompt_pad).split(","))

    def encode(batch):
        embeds, attn = ESMCQwen.apply(
            cfg, params,
            protein_input_ids=jnp.asarray(batch["protein_input_ids"]),
            protein_attention_mask=jnp.asarray(
                batch["protein_attention_mask"]),
            input_ids=jnp.asarray(batch["input_ids"]),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            return_decoder_inputs=True, attn_impl=args.attn_impl)
        # embeddings STAY on device (engine device-submit path): only
        # the tiny attention mask crosses to the host for lengths — a
        # D2H+H2D round-trip of the embeddings costs seconds per batch
        # under remote dispatch (~270 MB at the 14B flagship)
        return embeds, np.asarray(attn)

    trues = {}
    results = {}
    t0 = time.time()
    with jax.set_mesh(mesh):
        loader_it = iter(loader)
        first = next(loader_it, None)
        # prefix-shared KV discovery: the longest common token prefix of
        # the first batch's prompts is the chat-template header (system
        # message + user-turn opening).  Its embeddings are SLICED from
        # the encoder output — bit-identical to what a full prefill would
        # see — and its KV is computed once inside the engine.  Every
        # request is verified against the prefix ids; mismatches prefill
        # their full prompt (use_prefix=False), so output is exact always.
        shared_ids = None
        first_enc = None
        if first is not None:
            first_enc = encode(first)
            if args.shared_prefix:
                ids = np.asarray(first["input_ids"])
                am = np.asarray(first["attention_mask"])
                rows = [ids[i][am[i] > 0] for i in range(ids.shape[0])]
                if len(rows) >= 2:
                    L = min(len(r) for r in rows) - 1
                    eq = np.ones(max(L, 0), bool)
                    for r in rows[1:]:
                        eq &= r[:L] == rows[0][:L]
                    ncom = int(np.argmin(eq)) if not eq.all() else L
                    ph = np.flatnonzero(
                        rows[0][:ncom] == placeholder_id)
                    if ph.size:        # placeholder rows are per-request
                        ncom = int(ph[0])
                    if ncom >= 16:     # too short to pay for a dispatch
                        shared_ids = rows[0][:ncom].copy()
                        print(f"[serve] shared prompt prefix: {ncom} tokens")
        prefix_embeds = None
        if shared_ids is not None:
            embeds0, attn0 = first_enc
            p0 = int(attn0[0].sum())
            s0 = embeds0.shape[1] - p0     # row 0's left padding
            prefix_embeds = embeds0[0, s0:s0 + len(shared_ids)]

        eng = ContinuousBatcher(
            llm_cfg.core(), params["llm_decoder"], max_slots=args.max_slots,
            max_len=max(buckets) + args.max_new_tokens,
            prompt_pad=buckets if len(buckets) > 1 else buckets[0],
            eos_token_id=eos_id,
            cache_dtype=args.model_dtype, sync_every=args.sync_every,
            gen_cfg=gen_cfg, rng=jax.random.PRNGKey(args.random_seed),
            kv_bits=args.kv_bits,
            prompt_lookup_tokens=args.prompt_lookup_tokens,
            prompt_lookup_ngram=args.prompt_lookup_ngram,
            medusa_params=medusa_params,
            spec_break_even=args.spec_break_even,
            spec_probe_every=args.spec_probe_every,
            shared_prefix_embeds=prefix_embeds,
            prefix_dedup=args.prefix_dedup and prefix_embeds is not None)

        def _finish(name, toks):
            pred = tok.decode(
                [t for t in toks if t not in (pad_id, eos_id)],
                skip_special_tokens=True)
            results[name] = {"true": trues.pop(name), "pred": pred}

        def _submit_batch(batch, enc):
            embeds, attn = enc
            plens = attn.sum(axis=1).astype(int)
            ids = np.asarray(batch["input_ids"])
            for i, name in enumerate(batch["name"]):
                plen = int(plens[i])
                upfx = False
                if shared_ids is not None and plen > len(shared_ids):
                    row = ids[i][np.asarray(batch["attention_mask"][i]) > 0]
                    upfx = bool(np.array_equal(row[:len(shared_ids)],
                                               shared_ids))
                eff = plen - len(shared_ids) if upfx else plen
                if eff > max(buckets):
                    print(f"[serve] skipping {name}: prompt "
                          f"{eff} > --prompt_pad {max(buckets)}")
                    continue
                trues[name] = tok.decode(
                    [t for t in batch["description_input_ids"][i].tolist()
                     if t != pad_id],
                    skip_special_tokens=True)
                eng.submit(name, embeds[i], prompt_len=eff,
                           max_new_tokens=args.max_new_tokens,
                           use_prefix=upfx)

        # submission interleaves with draining (eng.pump backpressure):
        # at most ~2 batches of prompt embeddings (P×hidden fp32 each) are
        # ever held on the host, instead of the whole test split at once
        if first is not None:
            _submit_batch(first, first_enc)
            for name, toks in eng.pump(until_queue_below=args.max_slots):
                _finish(name, toks)
        for batch in loader_it:
            _submit_batch(batch, encode(batch))
            for name, toks in eng.pump(until_queue_below=args.max_slots):
                _finish(name, toks)

        for name, toks in eng.run():
            _finish(name, toks)
    dt = time.time() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(
        args.output_dir,
        f"generation_{args.output_identifier}_{jax.process_index()}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    n = len(results)
    print(f"{n} proteins in {dt:.1f}s "
          f"({n / dt * 3600:.0f} descriptions/hour, continuous batching, "
          f"{eng.steps} decode steps) → {out_path}")
    return results


if __name__ == "__main__":
    main()
