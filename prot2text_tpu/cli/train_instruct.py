"""Stage-2 LoRA instruction-SFT CLI — reference scripts/train_instruct.py.

Flags mirror train_instruct.py:59-79; PEFT/DDP plumbing replaced by the
jitted SFT step (train/sft.py) with LoRA trees and mesh sharding.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax

from ..core.checkpoint import (
    restore_checkpoint, save_checkpoint, timestamped_dir,
)
from ..core.dtypes import str2bool
from ..data.collate import Buckets, LightCollator
from ..data.dataset import Prot2TextLightDataset
from ..data.sampler import DataLoader, ShardedSampler, prefetch
from ..models.lora import LoraConfig, init_lora_params
from ..train.optim import TrainState, adamw_cosine_warmup
from ..train.sft import SFTConfig, make_sft_train_step
from .common import (
    LossLogger, add_common_args, place_batch, replicate_tree, setup_platform,
    shard_model_params, text_tokenizer,
)
from .train_contrast import build_models


def build_parser():
    p = argparse.ArgumentParser("train_instruct")
    add_common_args(p)
    p.add_argument("--train_csv", type=str, required=True)
    p.add_argument("--eval_csv", type=str, default=None)
    p.add_argument("--esm_model", type=str, default="esmc_600m")
    p.add_argument("--llm_model", type=str, default="Qwen/Qwen3-14B")
    p.add_argument("--llm_checkpoint_dir", type=str, default=None)
    p.add_argument("--esm_checkpoint_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--load_adapter_checkpoint_dir", type=str, default=None,
                   help="stage-1 adapter checkpoint dir")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_workers", type=int, default=0,
                   help="loader worker processes (reference torch num_workers)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=32)
    p.add_argument("--num_epochs", type=int, default=24)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--gradient_clipping", type=float, default=None)
    p.add_argument("--lora_rank", type=int, default=32)
    p.add_argument("--fix_modality_adapter", type=str2bool, default=False)
    p.add_argument("--name_dropout", type=float, default=0.8)
    p.add_argument("--taxonomy_dropout", type=float, default=0.8)
    p.add_argument("--resume_checkpoint_dir", type=str, default=None,
                   help="resume LoRA+adapter+optimizer+step")
    p.add_argument("--debug_trim_train_split", type=int, default=None)
    p.add_argument("--debug_tiny_model", type=str2bool, default=False)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of epoch 1 here")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    mesh = setup_platform(args)
    tok = text_tokenizer(args)

    dataset = Prot2TextLightDataset(args.train_csv)
    if args.debug_trim_train_split:
        dataset.df = dataset.df.iloc[:args.debug_trim_train_split]
    placeholder_token = getattr(tok, "placeholder_token",
                                "<|reserved_special_token_1|>")
    collater = LightCollator(
        tokenizer=tok, mode="train", placeholder_token=placeholder_token,
        name_dropout=args.name_dropout,
        taxonomy_dropout=args.taxonomy_dropout,
        buckets=Buckets(protein=[128, 256, 512, 1024],
                        prompt=[256, 512, 1024, 2048],
                        description=[128, 256, 512]))
    loader = DataLoader(
        dataset=dataset, collate_fn=collater,
        batch_size=args.batch_size * args.gradient_accumulation_steps, num_workers=args.num_workers,
        sampler=ShardedSampler(
            len(dataset), num_shards=jax.process_count(),
            shard_index=jax.process_index(), seed=args.random_seed))

    esm_cfg, llm_cfg, adapter_cfg, frozen_models, adapter = build_models(
        args, tok)
    if args.load_adapter_checkpoint_dir:
        restored = restore_checkpoint(args.load_adapter_checkpoint_dir)
        adapter = restored["adapter"]

    placeholder_id = getattr(tok, "placeholder_id", 151669)
    lora_cfg = LoraConfig(r=args.lora_rank, alpha=2 * args.lora_rank)
    sft_cfg = SFTConfig(lora=lora_cfg, placeholder_id=placeholder_id,
                        fix_modality_adapter=args.fix_modality_adapter)

    key = jax.random.PRNGKey(args.random_seed)
    frozen = {
        "esm_encoder": frozen_models["esm_encoder"],
        "llm_decoder": frozen_models["llm_decoder"],
        "adapter": adapter,
    }
    # frozen base towers sharded over fsdp/tp (FSDP-equivalent,
    # train_legacy.py:314-318); small LoRA/adapter trees replicated below
    frozen = shard_model_params(mesh, frozen)
    trainable = {
        "lora_esm": init_lora_params(
            lora_cfg, frozen["esm_encoder"], jax.random.fold_in(key, 1)),
        "lora_llm": init_lora_params(
            lora_cfg, frozen["llm_decoder"], jax.random.fold_in(key, 2)),
        "adapter": adapter,
    }

    steps_per_epoch = max(len(loader), 1)
    tx = adamw_cosine_warmup(
        args.learning_rate, total_steps=args.num_epochs * steps_per_epoch,
        warmup_frac=0.06, weight_decay=args.weight_decay,
        grad_clip=args.gradient_clipping)
    state = TrainState.create(trainable, tx)
    if args.resume_checkpoint_dir:
        import jax.numpy as jnp

        restored = restore_checkpoint(args.resume_checkpoint_dir)
        params = {"lora_esm": restored["lora_esm"],
                  "lora_llm": restored["lora_llm"],
                  "adapter": restored["adapter"]}
        state = TrainState(params=params,
                           opt_state=jax.tree_util.tree_unflatten(
                               jax.tree_util.tree_structure(state.opt_state),
                               jax.tree_util.tree_leaves(
                                   restored["opt_state"])),
                           step=jnp.asarray(restored["step"], jnp.int32))
        print(f"resumed from step {int(state.step)}")
    state = replicate_tree(mesh, state)
    step_fn = jax.jit(make_sft_train_step(
        esm_config=esm_cfg, adapter_config=adapter_cfg,
        decoder_core=llm_cfg.core(), cfg=sft_cfg, tx=tx,
        attn_impl=args.attn_impl,
        grad_accum=args.gradient_accumulation_steps),
        donate_argnums=(0,))

    eval_loader = None
    if args.eval_csv:
        from ..train.sft import make_sft_eval_step

        eval_ds = Prot2TextLightDataset(args.eval_csv)
        eval_collater = LightCollator(
            tokenizer=tok, mode="train",
            placeholder_token=placeholder_token,
            name_dropout=0.0, taxonomy_dropout=0.0,
            buckets=collater.buckets)
        eval_loader = DataLoader(
            dataset=eval_ds, collate_fn=eval_collater,
            batch_size=args.batch_size, num_workers=args.num_workers,
            sampler=ShardedSampler(
                len(eval_ds), num_shards=jax.process_count(),
                shard_index=jax.process_index(), shuffle=False))
        eval_fn = jax.jit(make_sft_eval_step(
            esm_config=esm_cfg, adapter_config=adapter_cfg,
            decoder_core=llm_cfg.core(), cfg=sft_cfg,
            attn_impl=args.attn_impl))

    ckpt_dir = timestamped_dir(args.checkpoint_dir)
    rng = jax.random.PRNGKey(args.random_seed)
    keys = ("protein_input_ids", "protein_attention_mask", "input_ids",
            "attention_mask", "labels")
    from ..core.observe import trace as profile_trace

    with jax.set_mesh(mesh), profile_trace(args.profile_dir):
        for epoch in range(1, args.num_epochs + 1):
            loader.set_epoch(epoch)
            t0 = time.time()
            log = LossLogger(args.log_every)
            for batch in prefetch(iter(loader)):
                micro = {
                    k: np.stack(np.split(
                        batch[k], args.gradient_accumulation_steps))
                    for k in keys
                }
                if args.gradient_accumulation_steps == 1:
                    micro = {k: v[0] for k, v in micro.items()}
                    micro = place_batch(mesh, micro, args.batch_size)
                else:
                    micro = place_batch(mesh, micro, args.batch_size,
                                        batch_dim=1)
                rng, sub = jax.random.split(rng)
                state, loss = step_fn(state, frozen, micro, sub)
                log.append(loss)   # device scalar; no per-step sync
            mean_loss, n_steps = log.finish()
            print(f"epoch {epoch}: train_loss={mean_loss:.4f} "
                  f"({time.time() - t0:.1f}s, {n_steps} steps)")
            if np.isnan(mean_loss):
                print("NaN loss — aborting", file=sys.stderr)
                break
            if eval_loader is not None:
                elog = LossLogger(args.log_every)
                for b in eval_loader:
                    elog.append(eval_fn(state.params, frozen, place_batch(
                        mesh, {k: b[k] for k in keys}, args.batch_size)))
                print(f"epoch {epoch}: eval_loss={elog.finish()[0]:.4f}")
            if (epoch == 1 or epoch == args.num_epochs
                    or epoch % args.save_every_epochs == 0):
                save_checkpoint(ckpt_dir, int(state.step), {
                    "lora_esm": state.params["lora_esm"],
                    "lora_llm": state.params["lora_llm"],
                    "adapter": state.params["adapter"],
                    "opt_state": state.opt_state,
                    "step": state.step,
                })
    print(f"checkpoints → {ckpt_dir}")


if __name__ == "__main__":
    main()
