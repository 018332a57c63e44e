"""Legacy full-finetune SFT CLI — reference scripts/train_legacy.py.

Trains `Esm2LlamaForCausalLM` (concat fusion) on the preprocessed instruct
dataset through the derived collator; FSDP option becomes the mesh `--fsdp`
axis; AdamW + StepLR(gamma) per epoch (train_legacy.py:324-325); bf16
replaces the fp16 GradScaler path.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax

from ..core.checkpoint import save_checkpoint, timestamped_dir
from ..core.dtypes import str2bool
from ..data.collate import Buckets, DerivedCollator
from ..data.dataset import Prot2TextInstructDataset
from ..data.sampler import DataLoader, ShardedSampler, prefetch
from ..models.composed import Esm2LlamaConfig, Esm2LlamaForCausalLM
from ..models.esm2 import ESM2Config
from ..models.llama import LlamaConfig
from ..train.legacy import make_legacy_train_step
from ..train.optim import TrainState, step_lr
from .common import (
    LossLogger, add_common_args, place_batch, setup_platform, shard_model_params,
    text_tokenizer,
)


def build_parser():
    p = argparse.ArgumentParser("train_legacy")
    add_common_args(p)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--train_csv", type=str, required=True)
    p.add_argument("--eval_csv", type=str, default=None)
    p.add_argument("--esm_checkpoint_dir", type=str, default=None)
    p.add_argument("--llama_checkpoint_dir", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--decoder_hidden_size", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_workers", type=int, default=0,
                   help="loader worker processes (reference torch num_workers)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--scheduler_gamma", type=float, default=0.1)
    p.add_argument("--gradient_clipping", type=float, default=None)
    p.add_argument("--original_eos_token_id", type=int, default=128009)
    p.add_argument("--resume_checkpoint_dir", type=str, default=None,
                   help="resume model+optimizer+step (reference"
                        " --load_general_checkpoint_path)")
    p.add_argument("--debug_trim_train_split", type=int, default=None)
    p.add_argument("--debug_tiny_model", type=str2bool, default=False)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of epoch 1 here")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    mesh = setup_platform(args)
    tok = text_tokenizer(args)

    dataset = Prot2TextInstructDataset(
        root_dir=args.data_root, csv_path=args.train_csv,
        description_tokenizer=tok, skip_download=True, skip_reload=True,
        ignore_graph_features=True)
    if args.debug_trim_train_split:
        dataset.usable_uids = dataset.usable_uids[
            :args.debug_trim_train_split]
    collater = DerivedCollator(
        tokenizer=tok, original_eos_token_id=args.original_eos_token_id,
        mode="train",
        buckets=Buckets(protein=[128, 256, 512, 1024],
                        description=[128, 256, 512]))
    loader = DataLoader(
        dataset=dataset, collate_fn=collater, batch_size=args.batch_size, num_workers=args.num_workers,
        sampler=ShardedSampler(
            len(dataset), num_shards=jax.process_count(),
            shard_index=jax.process_index(), seed=args.random_seed))

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
        eos_token_id=getattr(tok, "eos_token_id", 128001))

    model = Esm2LlamaForCausalLM(
        cfg, rng=jax.random.PRNGKey(args.random_seed))
    if args.esm_checkpoint_dir:
        from ..models.hf_import import esm2_params_from_hf, load_state_dict_dir

        model.params["esm_encoder"] = esm2_params_from_hf(
            load_state_dict_dir(args.esm_checkpoint_dir), esm_cfg.num_layers,
            args.model_dtype)
    if args.llama_checkpoint_dir:
        from ..models.hf_import import (
            decoder_params_from_hf, load_state_dict_dir,
        )

        model.params["llama_decoder"] = decoder_params_from_hf(
            load_state_dict_dir(args.llama_checkpoint_dir),
            llama_cfg.num_layers, args.model_dtype,
            tie_word_embeddings=llama_cfg.tie_word_embeddings)

    steps_per_epoch = max(len(loader), 1)
    tx = step_lr(args.learning_rate, args.scheduler_gamma, steps_per_epoch,
                 grad_clip=args.gradient_clipping)
    # full finetune: the model params themselves shard over fsdp/tp (the
    # reference's FSDP path, train_legacy.py:314-318); tx.init then yields
    # adam mu/nu with matching shardings
    model.params = shard_model_params(mesh, model.params)
    state = TrainState.create(model.params, tx)
    if args.resume_checkpoint_dir:
        import jax.numpy as jnp

        from ..core.checkpoint import restore_checkpoint

        restored = restore_checkpoint(args.resume_checkpoint_dir)
        state = TrainState(params=shard_model_params(mesh, restored["model"]),
                           opt_state=shard_model_params(
                               mesh, jax.tree_util.tree_unflatten(
                                   jax.tree_util.tree_structure(
                                       state.opt_state),
                                   jax.tree_util.tree_leaves(
                                       restored["opt_state"]))),
                           step=jnp.asarray(restored["step"], jnp.int32))
        print(f"resumed from step {int(state.step)}")
    step_fn = jax.jit(make_legacy_train_step(
        config=cfg, tx=tx, attn_impl=args.attn_impl,
        grad_accum=args.gradient_accumulation_steps))

    ckpt_dir = timestamped_dir(args.checkpoint_dir)
    keys = ("protein_input_ids", "protein_attention_mask", "input_ids",
            "attention_mask", "labels")
    from ..core.observe import trace as profile_trace

    with jax.set_mesh(mesh), profile_trace(args.profile_dir):
        for epoch in range(1, args.num_epochs + 1):
            loader.set_epoch(epoch)
            t0 = time.time()
            log = LossLogger(args.log_every)
            for batch in prefetch(iter(loader)):
                b = {k: batch[k] for k in keys}
                if args.gradient_accumulation_steps > 1:
                    b = {k: np.stack(np.split(
                        v, args.gradient_accumulation_steps))
                        for k, v in b.items()}
                    micro_bsz = args.batch_size // \
                        args.gradient_accumulation_steps
                    b = place_batch(mesh, b, micro_bsz, batch_dim=1)
                else:
                    b = place_batch(mesh, b, args.batch_size)
                state, loss = step_fn(state, b)
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
                    "model": state.params,
                    "opt_state": state.opt_state,
                    "step": state.step,
                })
    print(f"checkpoints → {ckpt_dir}")


if __name__ == "__main__":
    main()
