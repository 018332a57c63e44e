"""Batched generation CLI over the preprocessed instruct (PyG-style) dataset
— reference scripts/generate_instruct.py.

Decodes with Esm2LlamaInstructForCausalLM (or the RGCN variant with
--use_graph) and writes per-host JSON {name: {true, pred}}."""

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
from ..data.collate import Buckets, InstructCollator
from ..data.collate_graph import collate_graphs
from ..data.dataset import Prot2TextInstructDataset
from ..data.sampler import DataLoader, ShardedSampler
from ..models.adapters import ModalityAdapterConfig, RgcnAdapterConfig
from ..models.composed import (
    Esm2LlamaInstructConfig, Esm2LlamaInstructForCausalLM,
    Esm2Rgcn2LlamaInstructConfig, Esm2Rgcn2LlamaInstructForCausalLM,
)
from ..models.esm2 import ESM2Config
from ..models.llama import LlamaConfig
from ..core.mesh import pad_batch_to
from .common import (
    add_common_args, place_batch, setup_platform, shard_model_params,
    text_tokenizer,
)


def build_parser():
    p = argparse.ArgumentParser("generate_instruct")
    add_common_args(p)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--test_csv", type=str, required=True)
    p.add_argument("--esm_checkpoint_dir", type=str, default=None)
    p.add_argument("--llama_checkpoint_dir", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--load_checkpoint_dir", type=str, default=None)
    p.add_argument("--use_graph", type=str2bool, default=False)
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
    p.add_argument("--prompt_lookup_tokens", type=int, default=0,
                   help="n-gram lookup speculative decoding (HF "
                        "generate(prompt_lookup_num_tokens=...); exact "
                        "greedy outputs, training-free)")
    p.add_argument("--prompt_lookup_ngram", type=int, default=2)
    p.add_argument("--kv_bits", type=int, default=None,
                   help="8 = int8 KV cache (half the decode-attention HBM "
                        "bytes; ~0.4%% logit RMS error)")
    p.add_argument("--edge_budget", type=int, default=16384)
    p.add_argument("--output_dir", type=str, default="./generation_results")
    p.add_argument("--output_identifier", type=str, default="instruct")
    p.add_argument("--debug_trim_generate_split", type=int, default=None)
    p.add_argument("--debug_tiny_model", type=str2bool, default=False)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    mesh = setup_platform(args)
    tok = text_tokenizer(args)

    dataset = Prot2TextInstructDataset(
        root_dir=args.data_root, csv_path=args.test_csv,
        description_tokenizer=tok, skip_download=True, skip_reload=True,
        ignore_graph_features=not args.use_graph)
    if args.debug_trim_generate_split:
        dataset.usable_uids = dataset.usable_uids[
            :args.debug_trim_generate_split]
    collater = InstructCollator(
        text_pad_token_id=getattr(tok, "pad_token_id", 128002),
        mode="inference",
        buckets=Buckets(protein=[128, 256, 512, 1024],
                        prompt=[256, 512, 1024, 2048],
                        description=[128, 256, 512]))
    loader = DataLoader(
        dataset=dataset, collate_fn=lambda b: (collater(b), b),
        batch_size=args.batch_size, num_workers=args.num_workers,
        sampler=ShardedSampler(
            len(dataset), num_shards=jax.process_count(),
            shard_index=jax.process_index(), shuffle=False), drop_last=False)

    if args.debug_tiny_model:
        esm_cfg = ESM2Config(hidden_size=32, num_layers=2, num_heads=4,
                             intermediate_size=64)
        llama_cfg = LlamaConfig.tiny(
            vocab_size=getattr(tok, "vocab_size", 512))
    else:
        esm_cfg = ESM2Config.t36_3B()
        llama_cfg = LlamaConfig.llama_3_1_8b()
    placeholder_id = getattr(tok, "placeholder_id", 128003)
    llama_cfg = type(llama_cfg)(**{
        **llama_cfg.__dict__,
        "placeholder_id": placeholder_id,
        "eos_token_id": getattr(tok, "eos_token_id", 128009),
        "pad_token_id": getattr(tok, "pad_token_id", 128002),
    })

    if args.use_graph:
        cfg = Esm2Rgcn2LlamaInstructConfig(
            esm_config=esm_cfg,
            adapter_config=RgcnAdapterConfig(
                esm_cfg.hidden_size, 512, llama_cfg.hidden_size),
            llama_config=llama_cfg, placeholder_id=placeholder_id)
        model = Esm2Rgcn2LlamaInstructForCausalLM(
            cfg, rng=jax.random.PRNGKey(args.random_seed),
            attn_impl=args.attn_impl)
    else:
        cfg = Esm2LlamaInstructConfig(
            esm_config=esm_cfg,
            adapter_config=ModalityAdapterConfig(
                esm_cfg.hidden_size, 2048, llama_cfg.hidden_size),
            llama_config=llama_cfg, placeholder_id=placeholder_id)
        model = Esm2LlamaInstructForCausalLM(
            cfg, rng=jax.random.PRNGKey(args.random_seed),
            attn_impl=args.attn_impl)
    if args.load_checkpoint_dir:
        restored = restore_checkpoint(args.load_checkpoint_dir)
        model.params = restored.get("model", restored)
    model.params = shard_model_params(mesh, model.params)

    gen_kwargs = dict(
        max_new_tokens=args.max_new_tokens, do_sample=args.do_sample,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        num_beams=args.num_beams, length_penalty=args.length_penalty,
        early_stopping=args.early_stopping,
        prompt_lookup_tokens=args.prompt_lookup_tokens,
        prompt_lookup_ngram=args.prompt_lookup_ngram,
        kv_bits=args.kv_bits)
    pad_id = llama_cfg.pad_token_id

    results = {}
    t0 = time.time()
    akeys = ("input_ids", "attention_mask", "protein_input_ids",
             "protein_attention_mask")
    with jax.set_mesh(mesh):
        for batch, records in loader:
            names = batch["name"]
            arrays = {k: batch[k] for k in akeys}
            if len(names) < args.batch_size:
                # pad the final partial batch: ONE decode-loop compile shape
                # across an odd-sized split (light CLI already did this)
                arrays, _ = pad_batch_to(arrays, args.batch_size)
                records = list(records) + \
                    [records[-1]] * (args.batch_size - len(names))
            arrays = place_batch(mesh, arrays, args.batch_size)
            kw = {}
            if args.use_graph:
                S = arrays["protein_input_ids"].shape[1]
                g = collate_graphs(records, S, args.edge_budget)
                kw = {"graph_edge_index": jnp.asarray(g["edge_index"]),
                      "graph_edge_type": jnp.asarray(g["edge_type"]),
                      "graph_edge_mask": jnp.asarray(g["edge_mask"])}
            toks = model.generate(
                arrays["input_ids"],
                attention_mask=arrays["attention_mask"],
                protein_input_ids=arrays["protein_input_ids"],
                protein_attention_mask=arrays["protein_attention_mask"],
                **kw, **gen_kwargs)
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
          f"({n / max(dt, 1e-9) * 3600:.0f} descriptions/hour) → {out_path}")


if __name__ == "__main__":
    main()
