"""Convert reference/HF torch checkpoints into this framework's orbax format.

Covers the weight-porting step of SURVEY.md §7 (#2) as a one-shot tool:
  * --esm2_dir       HF EsmModel dir (safetensors/bin) → esm_encoder tree
  * --esmc_path      esm-package ESMC state-dict .pt → esm_encoder tree
  * --decoder_dir    HF Llama/Qwen3 dir → decoder tree (--qwen3 for qk-norm)
  * --adapter_path   reference adapter-only .pt (train_contrast.py output)

Each component is written under {output_dir}/step_0 as one orbax tree that
`core.checkpoint.restore_checkpoint` and the CLIs' --load_* flags consume.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..core.checkpoint import save_checkpoint
from ..core.dtypes import str2bool, str2dtype


def build_parser():
    p = argparse.ArgumentParser("convert_checkpoint")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--dtype", type=str2dtype, default="bf16")
    p.add_argument("--esm2_dir", type=str, default=None)
    p.add_argument("--esm2_num_layers", type=int, default=None)
    p.add_argument("--esmc_path", type=str, default=None)
    p.add_argument("--esmc_num_layers", type=int, default=36)
    p.add_argument("--decoder_dir", type=str, default=None)
    p.add_argument("--decoder_num_layers", type=int, default=None)
    p.add_argument("--qwen3", type=str2bool, default=False)
    p.add_argument("--tie_word_embeddings", type=str2bool, default=False)
    p.add_argument("--adapter_path", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    tree = {}

    if args.esm2_dir:
        from ..models.hf_import import esm2_params_from_hf, load_state_dict_dir

        sd = load_state_dict_dir(args.esm2_dir)
        n = args.esm2_num_layers
        if n is None:
            n = 1 + max(
                int(k.split(".")[2]) for k in sd
                if k.startswith("encoder.layer."))
        tree["esm_encoder"] = esm2_params_from_hf(sd, n, args.dtype)
        print(f"esm2: {n} layers")

    if args.esmc_path:
        import torch

        from ..models.esmc import esmc_params_from_torch

        sd = torch.load(args.esmc_path, map_location="cpu",
                        weights_only=True)
        tree["esm_encoder"] = esmc_params_from_torch(
            sd, args.esmc_num_layers, args.dtype)
        print(f"esmc: {args.esmc_num_layers} layers")

    if args.decoder_dir:
        from ..models.hf_import import (
            decoder_params_from_hf, load_state_dict_dir,
        )

        sd = load_state_dict_dir(args.decoder_dir)
        n = args.decoder_num_layers
        if n is None:
            n = 1 + max(
                int(k.split(".")[2]) for k in sd
                if k.startswith("model.layers."))
        tree["llm_decoder"] = decoder_params_from_hf(
            sd, n, args.dtype, qk_norm=args.qwen3,
            tie_word_embeddings=args.tie_word_embeddings)
        print(f"decoder: {n} layers (qwen3={args.qwen3})")

    if args.adapter_path:
        import torch

        from ..models.adapters import modality_adapter_params_from_torch

        sd = torch.load(args.adapter_path, map_location="cpu",
                        weights_only=True)
        if "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        prefix = ""
        if any(k.startswith("adapter.") for k in sd):
            prefix = "adapter."
        tree["adapter"] = modality_adapter_params_from_torch(
            sd, jnp.float32, prefix=prefix)
        print("adapter: fc1/fc2 converted")

    if not tree:
        raise SystemExit("nothing to convert — pass at least one source flag")
    path = save_checkpoint(args.output_dir, 0, tree)
    print(f"→ {path}")


if __name__ == "__main__":
    main()
