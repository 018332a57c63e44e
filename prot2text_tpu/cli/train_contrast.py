"""Stage-1 contrastive training CLI — reference scripts/train_contrast.py.

Flag surface mirrors the reference (train_contrast.py:48-69); the
spawn/NCCL/DDP scaffolding is gone: one jitted SPMD step over the mesh, with
cross-chip InfoNCE negatives the reference never had (SURVEY.md §2.4).

Offline demo (no downloaded assets):
  python -m prot2text_tpu.cli.train_contrast --train_csv data/train.csv \
      --debug_tiny_model true --num_epochs 1
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..core.checkpoint import save_checkpoint, timestamped_dir
from ..core.dtypes import str2bool, str2dtype
from ..data.collate import Buckets, LightCollator
from ..data.dataset import Prot2TextLightDataset
from ..data.sampler import DataLoader, ShardedSampler, prefetch
from ..models.adapters import ModalityAdapterConfig, init_modality_adapter_params
from ..models.esmc import ESMCConfig, init_esmc_params
from ..models.qwen3 import Qwen3Config, init_qwen3_params
from ..train.contrastive import ContrastiveConfig, make_contrastive_train_step
from ..train.optim import TrainState, adamw_cosine_warmup
from .common import (
    LossLogger, add_common_args, place_batch, replicate_tree, setup_platform,
    shard_model_params, text_tokenizer,
)


def build_parser():
    p = argparse.ArgumentParser("train_contrast")
    add_common_args(p)
    p.add_argument("--train_csv", type=str, required=True)
    p.add_argument("--eval_csv", type=str, default=None)
    p.add_argument("--esm_model", type=str, default="esmc_600m")
    p.add_argument("--llm_model", type=str, default="Qwen/Qwen3-14B")
    p.add_argument("--llm_checkpoint_dir", type=str, default=None,
                   help="local HF checkpoint dir for weights")
    p.add_argument("--esm_checkpoint_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=0,
                   help="loader worker processes (reference torch num_workers)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=8)
    p.add_argument("--num_epochs", type=int, default=12)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--gradient_clipping", type=float, default=None)
    p.add_argument("--contrastive_num_segments", type=int, default=2)
    p.add_argument("--output_llm_layer", type=int, default=16)
    p.add_argument("--temperature", type=float, default=0.05)
    p.add_argument("--name_dropout", type=float, default=0.8)
    p.add_argument("--taxonomy_dropout", type=float, default=0.8)
    p.add_argument("--resume_checkpoint_dir", type=str, default=None,
                   help="resume adapter+optimizer+step from a checkpoint dir"
                        " (reference --load_model_checkpoint_path +"
                        " --load_optimizer_scheduler_checkpoint_path; unlike"
                        " the reference, the step counter is restored too)")
    p.add_argument("--debug_trim_train_split", type=int, default=None)
    p.add_argument("--debug_trim_eval_split", type=int, default=None)
    p.add_argument("--debug_tiny_model", type=str2bool, default=False)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of epoch 1 here")
    return p


def build_models(args, tok):
    """Build (configs, frozen towers, adapter).  --model_dtype int8/int4
    builds bf16 weights and applies int8 weight-only quantization to the
    frozen towers (models/quant.py) — the TPU equivalent of the reference's
    bitsandbytes int8 path (utils_argparse.py:27-48)."""
    import jax.numpy as jnp

    quantize = args.model_dtype in (jnp.int8, jnp.int4)
    quant_bits = 4 if args.model_dtype == jnp.int4 else 8
    if quantize:
        args.model_dtype = jnp.bfloat16
    if args.debug_tiny_model:
        esm_cfg = ESMCConfig.tiny()
        llm_cfg = Qwen3Config(
            vocab_size=tok.vocab_size if hasattr(tok, "vocab_size") else 512,
            hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
            head_dim=16, intermediate_size=128)
        adapter_cfg = ModalityAdapterConfig(
            esm_cfg.d_model, 64, llm_cfg.hidden_size)
    else:
        esm_cfg = (ESMCConfig.esmc_600m() if "600" in args.esm_model
                   else ESMCConfig.esmc_300m())
        llm_cfg = Qwen3Config.qwen3_14b()
        adapter_cfg = ModalityAdapterConfig(
            esm_cfg.d_model, 2048, llm_cfg.hidden_size)

    dtype = args.model_dtype
    key = jax.random.PRNGKey(args.random_seed)
    ke, kl, ka = jax.random.split(key, 3)
    if args.esm_checkpoint_path:
        import torch

        from ..models.esmc import esmc_params_from_torch

        sd = torch.load(args.esm_checkpoint_path, map_location="cpu",
                        weights_only=True)
        esm_params = esmc_params_from_torch(sd, esm_cfg.n_layers, dtype)
    else:
        esm_params = init_esmc_params(esm_cfg, ke, dtype)
    if args.llm_checkpoint_dir:
        from ..models.hf_import import load_state_dict_dir, qwen3_params_from_hf

        sd = load_state_dict_dir(args.llm_checkpoint_dir)
        llm_params = qwen3_params_from_hf(sd, llm_cfg.num_layers, dtype)
    else:
        llm_params = init_qwen3_params(llm_cfg, kl, dtype)
    adapter = init_modality_adapter_params(adapter_cfg, ka)  # fp32 trainable
    if quantize:
        from ..models.quant import quantize_params

        esm_params = quantize_params(esm_params, bits=quant_bits)
        llm_params = quantize_params(llm_params, bits=quant_bits)
    return (esm_cfg, llm_cfg, adapter_cfg,
            {"esm_encoder": esm_params, "llm_decoder": llm_params}, adapter)


def main(argv=None):
    args = build_parser().parse_args(argv)
    mesh = setup_platform(args)
    tok = text_tokenizer(args)

    dataset = Prot2TextLightDataset(args.train_csv)
    if args.debug_trim_train_split:
        dataset.df = dataset.df.iloc[:args.debug_trim_train_split]
    collater = LightCollator(
        tokenizer=tok, mode="train",
        placeholder_token=getattr(tok, "placeholder_token",
                                  "<|reserved_special_token_1|>"),
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

    esm_cfg, llm_cfg, adapter_cfg, frozen, adapter = build_models(args, tok)
    # frozen towers sharded over fsdp/tp; adapter (trainable) replicated
    frozen = shard_model_params(mesh, frozen)
    ccfg = ContrastiveConfig(
        temperature=args.temperature,
        num_segments=args.contrastive_num_segments,
        output_llm_layer=min(args.output_llm_layer, llm_cfg.num_layers))
    steps_per_epoch = max(len(loader), 1)
    # reference parity: the contrastive scheduler steps PER EPOCH over a
    # num_epochs-long cosine (train_contrast.py:632, :662)
    tx = adamw_cosine_warmup(
        args.learning_rate, total_steps=args.num_epochs,
        warmup_frac=0.06, grad_clip=args.gradient_clipping,
        steps_per_period=steps_per_epoch)
    state = TrainState.create(adapter, tx)
    if args.resume_checkpoint_dir:
        from ..core.checkpoint import restore_checkpoint

        restored = restore_checkpoint(args.resume_checkpoint_dir)
        state = TrainState(params=restored["adapter"],
                           opt_state=jax.tree_util.tree_unflatten(
                               jax.tree_util.tree_structure(state.opt_state),
                               jax.tree_util.tree_leaves(
                                   restored["opt_state"])),
                           step=jnp.asarray(restored["step"], jnp.int32))
        print(f"resumed from step {int(state.step)}")
    state = replicate_tree(mesh, state)

    step_fn = jax.jit(make_contrastive_train_step(
        esm_config=esm_cfg, adapter_config=adapter_cfg,
        decoder_core=llm_cfg.core(), cfg=ccfg, tx=tx,
        attn_impl=args.attn_impl,
        grad_accum=args.gradient_accumulation_steps),
        donate_argnums=(0,))

    eval_loader = None
    if args.eval_csv:
        from ..train.contrastive import make_contrastive_eval_step

        eval_ds = Prot2TextLightDataset(args.eval_csv)
        if args.debug_trim_eval_split:
            eval_ds.df = eval_ds.df.iloc[:args.debug_trim_eval_split]
        eval_collater = LightCollator(
            tokenizer=tok, mode="train",
            placeholder_token=collater.placeholder_token,
            name_dropout=0.0, taxonomy_dropout=0.0,
            buckets=collater.buckets)
        eval_loader = DataLoader(
            dataset=eval_ds, collate_fn=eval_collater,
            batch_size=args.batch_size, num_workers=args.num_workers,
            sampler=ShardedSampler(
                len(eval_ds), num_shards=jax.process_count(),
                shard_index=jax.process_index(), shuffle=False))
        eval_fn = jax.jit(make_contrastive_eval_step(
            esm_config=esm_cfg, adapter_config=adapter_cfg,
            decoder_core=llm_cfg.core(), cfg=ccfg,
            attn_impl=args.attn_impl))

    ckpt_dir = timestamped_dir(args.checkpoint_dir)
    rng = jax.random.PRNGKey(args.random_seed)
    from ..core.observe import trace as profile_trace

    with jax.set_mesh(mesh), profile_trace(args.profile_dir):
        for epoch in range(1, args.num_epochs + 1):
            loader.set_epoch(epoch)
            t0 = time.time()
            log = LossLogger(args.log_every, positive_required=True)
            for batch in prefetch(iter(loader)):
                micro = {
                    k: np.stack(np.split(
                        v, args.gradient_accumulation_steps))
                    for k, v in batch.items()
                    if isinstance(v, np.ndarray)
                    and k in ("protein_input_ids", "protein_attention_mask",
                              "description_input_ids",
                              "description_attention_mask")
                }
                if args.gradient_accumulation_steps == 1:
                    micro = {k: v[0] for k, v in micro.items()}
                    micro = place_batch(mesh, micro, args.batch_size)
                else:
                    micro = place_batch(mesh, micro, args.batch_size,
                                        batch_dim=1)
                rng, sub = jax.random.split(rng)
                state, loss = step_fn(state, frozen, micro, sub)
                log.append(loss)          # device scalar; no per-step sync
            mean_loss, n_steps = log.finish()
            print(f"epoch {epoch}: train_loss={mean_loss:.4f} "
                  f"({time.time() - t0:.1f}s, {n_steps} steps)")
            if np.isnan(mean_loss):
                print("NaN loss — aborting (reference train_contrast.py:477)",
                      file=sys.stderr)
                break
            if eval_loader is not None:
                ekeys = ("protein_input_ids", "protein_attention_mask",
                         "description_input_ids",
                         "description_attention_mask")
                elog = LossLogger(args.log_every)
                for b in eval_loader:
                    elog.append(eval_fn(state.params, frozen, place_batch(
                        mesh, {k: b[k] for k in ekeys}, args.batch_size)))
                print(f"epoch {epoch}: eval_loss={elog.finish()[0]:.4f}")
            if (epoch == 1 or epoch == args.num_epochs
                    or epoch % args.save_every_epochs == 0):
                save_checkpoint(ckpt_dir, int(state.step), {
                    "adapter": state.params,
                    "opt_state": state.opt_state,
                    "step": state.step,
                })
    print(f"checkpoints → {ckpt_dir}")


if __name__ == "__main__":
    main()
