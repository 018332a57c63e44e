"""Batched generation CLI over the CSV-backed light dataset — reference
scripts/generate_instruct_light.py.

Merges LoRA into the base weights before decoding (merge_and_unload
equivalent, reference generate_instruct.py:190-191), runs the KV-cached
device-side decode loop, and writes per-host JSON {name: {true, pred}}
(generate_instruct.py:133-143).
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
from ..infer.generate import GenerationConfig, run_generation
from ..models.composed import ESMCQwen, ESMCQwenConfig
from ..models.lora import LoraConfig, merge_lora
from .common import (
    add_common_args, place_batch, setup_platform, shard_model_params,
    text_tokenizer,
)
from .train_contrast import build_models


def build_parser():
    p = argparse.ArgumentParser("generate_instruct_light")
    add_common_args(p)
    p.add_argument("--test_csv", type=str, required=True)
    p.add_argument("--esm_model", type=str, default="esmc_600m")
    p.add_argument("--llm_model", type=str, default="Qwen/Qwen3-14B")
    p.add_argument("--llm_checkpoint_dir", type=str, default=None)
    p.add_argument("--esm_checkpoint_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--load_sft_checkpoint_dir", type=str, default=None)
    p.add_argument("--load_peft_adapter_dir", type=str, default=None,
                   help="reference-style PEFT LoRA dir for the LLM decoder")
    p.add_argument("--lora_rank", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_workers", type=int, default=0,
                   help="loader worker processes (reference torch num_workers)")
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--length_penalty", type=float, default=1.0)
    p.add_argument("--early_stopping", type=str2bool, default=False)
    p.add_argument("--do_sample", type=str2bool, default=False)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--max_sequence_length", type=int, default=512)
    p.add_argument("--speculative_gamma", type=int, default=0,
                   help="enable greedy speculative decoding with this many "
                        "draft tokens per verify (exact greedy outputs; "
                        "needs --draft_checkpoint_dir)")
    p.add_argument("--draft_checkpoint_dir", type=str, default=None,
                   help="HF checkpoint dir of a small same-tokenizer draft "
                        "decoder (the draft sees the raw prompt tokens, not "
                        "the protein fusion — a weaker draft only costs "
                        "acceptance rate, never correctness)")
    p.add_argument("--self_speculative_layers", type=int, default=0,
                   help="with --speculative_gamma: draft with the TARGET's "
                        "own first N layers + lm_head (early-exit / "
                        "LayerSkip-style) instead of a separate draft "
                        "model — no extra weights resident")
    p.add_argument("--prompt_lookup_tokens", type=int, default=0,
                   help="draft this many tokens per verify by n-gram "
                        "lookup over the text prompt + generated tokens "
                        "(HF generate(prompt_lookup_num_tokens=...) "
                        "equivalent; training-free, exact greedy outputs)")
    p.add_argument("--prompt_lookup_ngram", type=int, default=2,
                   help="match length for --prompt_lookup_tokens")
    p.add_argument("--output_dir", type=str, default="./generation_results")
    p.add_argument("--output_identifier", type=str, default="light")
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
        dataset=dataset, collate_fn=collater, batch_size=args.batch_size, num_workers=args.num_workers,
        sampler=ShardedSampler(
            len(dataset), num_shards=jax.process_count(),
            shard_index=jax.process_index(), shuffle=False), drop_last=False)

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
        # merge-and-unload: fold LoRA into base weights for inference
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
    gen_cfg = GenerationConfig(
        max_new_tokens=args.max_new_tokens, eos_token_id=eos_id,
        pad_token_id=pad_id, do_sample=args.do_sample,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        num_beams=args.num_beams, length_penalty=args.length_penalty,
        early_stopping=args.early_stopping)

    draft = None
    if args.prompt_lookup_tokens > 0 and args.speculative_gamma > 0:
        raise SystemExit("--prompt_lookup_tokens and --speculative_gamma "
                         "are mutually exclusive draft sources")
    if args.prompt_lookup_tokens > 0 and (args.do_sample
                                          or args.num_beams > 1):
        raise SystemExit("speculative decoding is greedy-only")
    if args.speculative_gamma > 0:
        if args.do_sample or args.num_beams > 1:
            raise SystemExit("speculative decoding is greedy-only")
        if args.self_speculative_layers > 0:
            draft = "self"
            draft_cfg = draft_params = None
        elif args.debug_tiny_model:
            from ..models.qwen3 import init_qwen3_params

            draft_cfg = type(llm_cfg)(**{**llm_cfg.__dict__})
            draft_params = init_qwen3_params(
                draft_cfg, jax.random.PRNGKey(args.random_seed + 1),
                args.model_dtype)
        else:
            if not args.draft_checkpoint_dir:
                raise SystemExit("--speculative_gamma needs "
                                 "--draft_checkpoint_dir")
            from ..models.hf_import import (
                load_state_dict_dir, qwen3_params_from_hf,
            )
            from ..models.qwen3 import Qwen3Config

            draft_cfg = Qwen3Config.qwen3_0_6b()
            draft_params = qwen3_params_from_hf(
                load_state_dict_dir(args.draft_checkpoint_dir),
                draft_cfg.num_layers, args.model_dtype)
        if draft != "self":
            draft = (draft_cfg, draft_params)

    results = {}
    t0 = time.time()
    with jax.set_mesh(mesh):
        for batch in loader:
            # pad the final partial batch so the jitted decode keeps ONE shape
            names = batch["name"]
            n_valid = len(names)
            if n_valid < args.batch_size:
                arrays = {k: v for k, v in batch.items()
                          if isinstance(v, np.ndarray)}
                from ..core.mesh import pad_batch_to

                arrays, _ = pad_batch_to(arrays, args.batch_size)
                batch = {**batch, **arrays}
            placed = place_batch(
                mesh, {k: batch[k] for k in
                       ("protein_input_ids", "protein_attention_mask",
                        "input_ids", "attention_mask")}, args.batch_size)
            embeds, attn = ESMCQwen.apply(
                cfg, params,
                protein_input_ids=placed["protein_input_ids"],
                protein_attention_mask=placed["protein_attention_mask"],
                input_ids=placed["input_ids"],
                attention_mask=placed["attention_mask"],
                return_decoder_inputs=True, attn_impl=args.attn_impl)
            if args.prompt_lookup_tokens > 0:
                from ..infer.speculative import prompt_lookup_generate

                toks, _ = prompt_lookup_generate(
                    llm_cfg.core(), params["llm_decoder"],
                    inputs_embeds=embeds, attention_mask=attn,
                    gen_cfg=gen_cfg,
                    prompt_ids=placed["input_ids"],
                    prompt_ids_mask=placed["attention_mask"],
                    gamma=args.prompt_lookup_tokens,
                    ngram=args.prompt_lookup_ngram,
                    attn_impl=args.attn_impl)
            elif draft == "self":
                from ..infer.speculative import self_speculative_generate

                toks, _ = self_speculative_generate(
                    llm_cfg.core(), params["llm_decoder"],
                    inputs_embeds=embeds, attention_mask=attn,
                    gen_cfg=gen_cfg,
                    draft_layers=args.self_speculative_layers,
                    gamma=args.speculative_gamma, attn_impl=args.attn_impl)
            elif draft is not None:
                from ..infer.speculative import speculative_generate

                draft_cfg, draft_params = draft
                demb = draft_params["embed_tokens"][
                    jnp.asarray(batch["input_ids"])]
                toks, _ = speculative_generate(
                    llm_cfg.core(), params["llm_decoder"],
                    draft_cfg.core(), draft_params,
                    inputs_embeds=embeds, draft_inputs_embeds=demb,
                    attention_mask=attn, gen_cfg=gen_cfg,
                    gamma=args.speculative_gamma, attn_impl=args.attn_impl)
            else:
                toks = run_generation(
                    llm_cfg.core(), params["llm_decoder"],
                    inputs_embeds=embeds, attention_mask=attn,
                    gen_cfg=gen_cfg, attn_impl=args.attn_impl)
            toks = np.asarray(toks)
            for i, name in enumerate(names):
                pred = tok.decode(
                    [t for t in toks[i].tolist() if t != pad_id],
                    skip_special_tokens=True)
                true = tok.decode(
                    [t for t in batch["description_input_ids"][i].tolist()
                     if t != pad_id],
                    skip_special_tokens=True)
                results[name] = {"true": true, "pred": pred}
    dt = time.time() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(
        args.output_dir,
        f"generation_{args.output_identifier}_{jax.process_index()}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    n = len(results)
    print(f"{n} proteins in {dt:.1f}s "
          f"({n / dt * 3600:.0f} descriptions/hour) → {out_path}")


if __name__ == "__main__":
    main()
