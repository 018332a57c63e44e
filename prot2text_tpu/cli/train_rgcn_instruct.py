"""SFT CLI for the structure-graph model (Esm2Rgcn2LlamaInstruct).

The reference ships the RGCN model and decodes with it but has no trainer;
this CLI trains the RGCN adapter + decoder LoRA on the preprocessed instruct
dataset (graphs from the native PDB featurizer) via train/graph_instruct.py.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..core.checkpoint import save_checkpoint, timestamped_dir
from ..core.dtypes import str2bool
from ..data.collate import Buckets, InstructCollator
from ..data.collate_graph import collate_graphs
from ..data.dataset import Prot2TextInstructDataset
from ..data.sampler import DataLoader, ShardedSampler, prefetch
from ..models.adapters import RgcnAdapterConfig, init_rgcn_adapter_params
from ..models.esm2 import ESM2Config, init_esm2_params
from ..models.llama import LlamaConfig, init_llama_params
from ..models.lora import LoraConfig, init_lora_params
from ..train.graph_instruct import GraphSFTConfig, make_graph_sft_train_step
from ..train.optim import TrainState, adamw_cosine_warmup
from .common import (
    LossLogger, add_common_args, place_batch, replicate_tree, setup_platform,
    shard_model_params, text_tokenizer,
)


def build_parser():
    p = argparse.ArgumentParser("train_rgcn_instruct")
    add_common_args(p)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--train_csv", type=str, required=True)
    p.add_argument("--esm_checkpoint_dir", type=str, default=None)
    p.add_argument("--llama_checkpoint_dir", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_workers", type=int, default=0,
                   help="loader worker processes (reference torch num_workers)")
    p.add_argument("--num_epochs", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--gradient_clipping", type=float, default=None)
    p.add_argument("--lora_rank", type=int, default=32)
    p.add_argument("--rgcn_layers", type=int, default=6)
    p.add_argument("--rgcn_intermediate_dim", type=int, default=512)
    p.add_argument("--edge_budget", type=int, default=16384)
    p.add_argument("--debug_trim_train_split", type=int, default=None)
    p.add_argument("--debug_tiny_model", type=str2bool, default=False)
    p.add_argument("--profile_dir", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    mesh = setup_platform(args)
    tok = text_tokenizer(args)

    dataset = Prot2TextInstructDataset(
        root_dir=args.data_root, csv_path=args.train_csv,
        description_tokenizer=tok, skip_download=True, skip_reload=True,
        ignore_graph_features=False)
    if args.debug_trim_train_split:
        dataset.usable_uids = dataset.usable_uids[
            :args.debug_trim_train_split]
    collater = InstructCollator(
        text_pad_token_id=getattr(tok, "pad_token_id", 128002), mode="train",
        buckets=Buckets(protein=[128, 256, 512, 1024],
                        prompt=[256, 512, 1024, 2048],
                        description=[128, 256, 512]))
    loader = DataLoader(
        dataset=dataset, collate_fn=lambda b: (collater(b), b),
        batch_size=args.batch_size, num_workers=args.num_workers,
        sampler=ShardedSampler(
            len(dataset), num_shards=jax.process_count(),
            shard_index=jax.process_index(), seed=args.random_seed))

    if args.debug_tiny_model:
        esm_cfg = ESM2Config(hidden_size=32, num_layers=2, num_heads=4,
                             intermediate_size=64)
        llama_cfg = LlamaConfig.tiny(
            vocab_size=getattr(tok, "vocab_size", 512))
        rgcn_dim = 48
    else:
        esm_cfg = ESM2Config.t36_3B()
        llama_cfg = LlamaConfig.llama_3_1_8b()
        rgcn_dim = args.rgcn_intermediate_dim
    placeholder_id = getattr(tok, "placeholder_id", 128003)
    ad_cfg = RgcnAdapterConfig(
        esm_cfg.hidden_size, rgcn_dim, llama_cfg.hidden_size,
        n_layers=args.rgcn_layers)

    key = jax.random.PRNGKey(args.random_seed)
    frozen = {
        "esm_encoder": init_esm2_params(
            esm_cfg, jax.random.fold_in(key, 0), args.model_dtype),
        "llama_decoder": init_llama_params(
            llama_cfg, jax.random.fold_in(key, 1), args.model_dtype),
    }
    if args.esm_checkpoint_dir:
        from ..models.hf_import import esm2_params_from_hf, load_state_dict_dir

        frozen["esm_encoder"] = esm2_params_from_hf(
            load_state_dict_dir(args.esm_checkpoint_dir),
            esm_cfg.num_layers, args.model_dtype)
    if args.llama_checkpoint_dir:
        from ..models.hf_import import (
            decoder_params_from_hf, load_state_dict_dir,
        )

        frozen["llama_decoder"] = decoder_params_from_hf(
            load_state_dict_dir(args.llama_checkpoint_dir),
            llama_cfg.num_layers, args.model_dtype,
            tie_word_embeddings=llama_cfg.tie_word_embeddings)

    # frozen towers sharded over fsdp/tp; trainable adapter+LoRA replicated
    frozen = shard_model_params(mesh, frozen)

    lora_cfg = LoraConfig(r=args.lora_rank, alpha=2 * args.lora_rank)
    trainable = {
        "adapter": init_rgcn_adapter_params(
            ad_cfg, jax.random.fold_in(key, 2)),
        "lora_llm": init_lora_params(
            lora_cfg, frozen["llama_decoder"], jax.random.fold_in(key, 3)),
    }
    cfg = GraphSFTConfig(lora=lora_cfg, placeholder_id=placeholder_id,
                         remat=not args.debug_tiny_model)

    steps_per_epoch = max(len(loader), 1)
    tx = adamw_cosine_warmup(
        args.learning_rate, total_steps=args.num_epochs * steps_per_epoch,
        warmup_frac=0.06, grad_clip=args.gradient_clipping)
    state = replicate_tree(mesh, TrainState.create(trainable, tx))
    step_fn = jax.jit(make_graph_sft_train_step(
        esm_config=esm_cfg, adapter_config=ad_cfg,
        decoder_core=llama_cfg.core(), cfg=cfg, tx=tx,
        attn_impl=args.attn_impl), donate_argnums=(0,))

    ckpt_dir = timestamped_dir(args.checkpoint_dir)
    rng = jax.random.PRNGKey(args.random_seed)
    from ..core.observe import trace as profile_trace

    with jax.set_mesh(mesh), profile_trace(args.profile_dir):
        for epoch in range(1, args.num_epochs + 1):
            loader.set_epoch(epoch)
            t0 = time.time()
            log = LossLogger(args.log_every)
            for batch, records in prefetch(iter(loader)):
                S = batch["protein_input_ids"].shape[1]
                g = collate_graphs(records, S, args.edge_budget)
                b = {
                    "protein_input_ids": jnp.asarray(
                        batch["protein_input_ids"]),
                    "protein_attention_mask": jnp.asarray(
                        batch["protein_attention_mask"]),
                    "input_ids": jnp.asarray(batch["input_ids"]),
                    "attention_mask": jnp.asarray(batch["attention_mask"]),
                    "labels": jnp.asarray(batch["labels"]),
                    "graph_edge_index": np.asarray(g["edge_index"]),
                    "graph_edge_type": np.asarray(g["edge_type"]),
                    "graph_edge_mask": np.asarray(g["edge_mask"]),
                }
                # flat cross-graph edge buffers index the whole batch's
                # node set — keep them replicated, shard only batch dims
                b = place_batch(
                    mesh, b, args.batch_size,
                    replicate_keys=("graph_edge_index", "graph_edge_type",
                                    "graph_edge_mask"))
                rng, sub = jax.random.split(rng)
                state, loss = step_fn(state, frozen, b, sub)
                log.append(loss)   # device scalar; no per-step sync
            mean_loss, n_steps = log.finish()
            print(f"epoch {epoch}: train_loss={mean_loss:.4f} "
                  f"({time.time() - t0:.1f}s, {n_steps} steps)")
            if np.isnan(mean_loss):
                print("NaN loss — aborting", file=sys.stderr)
                break
            if (epoch == 1 or epoch == args.num_epochs
                    or epoch % args.save_every_epochs == 0):
                save_checkpoint(ckpt_dir, int(state.step), {
                    "adapter": state.params["adapter"],
                    "lora_llm": state.params["lora_llm"],
                    "opt_state": state.opt_state,
                    "step": state.step,
                })
    print(f"checkpoints → {ckpt_dir}")


if __name__ == "__main__":
    main()
