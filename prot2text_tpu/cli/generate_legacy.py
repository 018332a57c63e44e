"""Batched generation CLI for the legacy concat-fusion model — reference
scripts/generate_legacy.py (eos 128001 at :67; output includes the prompt,
modeling_esm2llama_legacy.py:505-507)."""

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
from ..data.collate import Buckets, DerivedCollator
from ..data.dataset import Prot2TextInstructDataset
from ..data.sampler import DataLoader, ShardedSampler
from ..models.composed import Esm2LlamaConfig, Esm2LlamaForCausalLM
from ..models.esm2 import ESM2Config
from ..models.llama import LlamaConfig
from ..core.mesh import pad_batch_to
from .common import (
    add_common_args, place_batch, setup_platform, shard_model_params,
    text_tokenizer,
)


def build_parser():
    p = argparse.ArgumentParser("generate_legacy")
    add_common_args(p)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--test_csv", type=str, required=True)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--load_checkpoint_dir", type=str, default=None)
    p.add_argument("--decoder_hidden_size", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_workers", type=int, default=0,
                   help="loader worker processes (reference torch num_workers)")
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--do_sample", type=str2bool, default=False)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--original_eos_token_id", type=int, default=128009)
    p.add_argument("--output_dir", type=str, default="./generation_results")
    p.add_argument("--output_identifier", type=str, default="legacy")
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
        ignore_graph_features=True,
        max_description_length=None)  # untrimmed labels (generate_legacy:144)
    if args.debug_trim_generate_split:
        dataset.usable_uids = dataset.usable_uids[
            :args.debug_trim_generate_split]
    collater = DerivedCollator(
        tokenizer=tok, original_eos_token_id=args.original_eos_token_id,
        mode="inference",
        buckets=Buckets(protein=[128, 256, 512, 1024]))
    loader = DataLoader(
        dataset=dataset, collate_fn=collater, batch_size=args.batch_size, num_workers=args.num_workers,
        sampler=ShardedSampler(
            len(dataset), num_shards=jax.process_count(),
            shard_index=jax.process_index(), shuffle=False), drop_last=False)

    if args.debug_tiny_model:
        esm_cfg = ESM2Config(hidden_size=32, num_layers=2, num_heads=4,
                             intermediate_size=64)
        llama_cfg = LlamaConfig.tiny(
            vocab_size=getattr(tok, "vocab_size", 512))
        dec_hidden = llama_cfg.hidden_size
    else:
        esm_cfg = ESM2Config.t6_8M()
        llama_cfg = LlamaConfig.llama_3_2_1b()
        dec_hidden = args.decoder_hidden_size
    cfg = Esm2LlamaConfig(
        esm_config=esm_cfg, llama_config=llama_cfg,
        decoder_hidden_size=dec_hidden,
        bos_token_id=getattr(tok, "bos_token_id", 128000),
        eos_token_id=getattr(tok, "eos_token_id", 128001))
    model = Esm2LlamaForCausalLM(
        cfg, rng=jax.random.PRNGKey(args.random_seed),
        attn_impl=args.attn_impl)
    if args.load_checkpoint_dir:
        restored = restore_checkpoint(args.load_checkpoint_dir)
        model.params = restored.get("model", restored)
    model.params = shard_model_params(mesh, model.params)

    pad_id = llama_cfg.pad_token_id
    akeys = ("input_ids", "attention_mask", "protein_input_ids",
             "protein_attention_mask")
    results = {}
    t0 = time.time()
    with jax.set_mesh(mesh):
        for batch in loader:
            names = batch["name"]
            arrays = {k: batch[k] for k in akeys}
            if len(names) < args.batch_size:
                # pad the final partial batch — one compile shape per bucket
                arrays, _ = pad_batch_to(arrays, args.batch_size)
            arrays = place_batch(mesh, arrays, args.batch_size)
            toks = model.generate(
                inputs=arrays["input_ids"],
                attention_mask=arrays["attention_mask"],
                protein_input_ids=arrays["protein_input_ids"],
                protein_attention_mask=arrays["protein_attention_mask"],
                max_new_tokens=args.max_new_tokens,
                do_sample=args.do_sample, temperature=args.temperature,
                top_k=args.top_k, top_p=args.top_p)
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
    print(f"{n} proteins in {dt:.1f}s → {out_path}")


if __name__ == "__main__":
    main()
