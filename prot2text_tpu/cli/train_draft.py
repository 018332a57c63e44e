"""Train Medusa draft heads for speculative serving (models/medusa.py,
train/draft.py).

Beyond reference parity (the reference has no speculative decoding at
all): distills K residual-MLP heads against the FROZEN target decoder on
the dataset's description text — the same text distribution the serving
engine decodes — and saves an npz that `cli/serve.py --medusa_path`
loads.  One jitted step; the decoder forward is frozen (stop_gradient),
so the trainable state is only the (K, H, H)+(K, H) head stack.

    python -m prot2text_tpu.cli.train_draft --train_csv data/train.csv \
        --llm_checkpoint_dir ckpt_q --num_heads 4 --output_path medusa.npz
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dataset import Prot2TextLightDataset
from ..data.sampler import DataLoader, ShardedSampler
from ..models.medusa import MedusaConfig, init_medusa_params
from ..train.draft import make_medusa_train_step
from ..train.optim import TrainState, adamw_constant
from .common import (
    LossLogger, add_common_args, place_batch, replicate_tree, setup_platform,
    shard_model_params, text_tokenizer,
)
from .train_contrast import build_models


def build_parser():
    p = argparse.ArgumentParser("train_draft")
    add_common_args(p)
    p.add_argument("--train_csv", type=str, required=True)
    p.add_argument("--esm_model", type=str, default="esmc_600m")
    p.add_argument("--llm_model", type=str, default="Qwen/Qwen3-14B")
    p.add_argument("--llm_checkpoint_dir", type=str, default=None)
    p.add_argument("--esm_checkpoint_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_sequence_length", type=int, default=256)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--output_path", type=str, default="medusa.npz")
    p.add_argument("--debug_tiny_model", type=lambda s: s.lower() == "true",
                   default=False)
    p.add_argument("--debug_trim_train_split", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    mesh = setup_platform(args)
    tok = text_tokenizer(args)

    dataset = Prot2TextLightDataset(args.train_csv)
    if args.debug_trim_train_split:
        dataset.df = dataset.df.iloc[:args.debug_trim_train_split]

    S = args.max_sequence_length
    pad_id = getattr(tok, "pad_token_id", 0) or 0

    def collate(rows):
        ids = np.full((len(rows), S), pad_id, np.int32)
        mask = np.zeros((len(rows), S), np.int32)
        for i, row in enumerate(rows):
            t = tok.encode(str(row["function"]))[:S]
            ids[i, :len(t)] = t
            mask[i, :len(t)] = 1
        return {"input_ids": jnp.asarray(ids),
                "attention_mask": jnp.asarray(mask)}

    loader = DataLoader(
        dataset=dataset, collate_fn=collate, batch_size=args.batch_size,
        sampler=ShardedSampler(len(dataset),
                               num_shards=jax.process_count(),
                               shard_index=jax.process_index(),
                               shuffle=True, seed=args.random_seed),
        drop_last=True)

    _, llm_cfg, _, frozen, _ = build_models(args, tok)
    core = llm_cfg.core()
    # frozen tower sharded over (fsdp, tp) like the other trainers; the
    # tiny head state replicates and its grads psum over the data axes
    dec_params = shard_model_params(mesh, frozen["llm_decoder"])

    med_cfg = MedusaConfig(core.hidden_size, args.num_heads)
    tx = adamw_constant(args.learning_rate)
    state = TrainState.create(
        replicate_tree(mesh, init_medusa_params(
            med_cfg, jax.random.PRNGKey(args.random_seed), jnp.float32)), tx)
    step = make_medusa_train_step(core, tx)

    logger = LossLogger(args.log_every, label="medusa loss")
    with jax.set_mesh(mesh):
        for epoch in range(args.num_epochs):
            loader.set_epoch(epoch)
            for batch in loader:
                state, loss = step(
                    state, dec_params,
                    place_batch(mesh, batch, args.batch_size))
                logger.append(loss)
            mean, n = logger.finish()
            print(f"epoch {epoch}: medusa loss {mean:.4f} over {n} steps")

    np.savez(args.output_path,
             w=np.asarray(state.params["w"], np.float32),
             b=np.asarray(state.params["b"], np.float32))
    print(f"saved {args.num_heads} heads -> {args.output_path}")


if __name__ == "__main__":
    main()
