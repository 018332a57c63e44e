"""PEFT adapter-directory interop.

The reference saves stage-2 checkpoints as PEFT `save_pretrained` adapter
dirs and reloads them with `PeftModel.from_pretrained`
(train_instruct.py:489-508, :147-153).  These converters make those artifacts
first-class here:

  * `lora_params_from_peft_dir(dir, base_params)` → this repo's LoRA tree
    (stacked per-layer A/B, layout of models/lora.py) + LoraConfig(r, alpha)
  * `save_peft_dir(dir, lora_params, cfg)` → adapter_model.safetensors +
    adapter_config.json that PEFT can load back

PEFT key layout (observed from peft==installed):
  base_model.model.model.layers.{i}.self_attn.{q,k,v,o}_proj.lora_A.weight  (r, din)
  base_model.model.model.layers.{i}.mlp.{gate,up,down}_proj.lora_B.weight   (dout, r)
Ours: A = lora_A.T (din, r), B = lora_B.T (r, dout), stacked on a leading
layer dim.
"""

from __future__ import annotations

import json
import os
import re
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lora import LoraConfig

_PEFT_NAME = {
    "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


def lora_params_from_peft_dir(path: str, base_params,
                              dtype=jnp.float32) -> Tuple[dict, LoraConfig]:
    """Convert a PEFT LoRA adapter dir targeting a Llama/Qwen decoder into
    this repo's LoRA tree matching `base_params`' structure."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    cfg = LoraConfig(r=acfg["r"], alpha=acfg["lora_alpha"])

    from safetensors import safe_open

    tensors = {}
    with safe_open(os.path.join(path, "adapter_model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)

    # group by (layer, proj)
    pat = re.compile(
        r"layers\.(\d+)\.((?:self_attn|mlp)\.\w+_proj)\.lora_(A|B)\.weight$")
    grouped: dict = {}
    for k, v in tensors.items():
        m = pat.search(k)
        if not m:
            continue
        layer, peft_name, ab = int(m.group(1)), m.group(2), m.group(3)
        grouped.setdefault((layer, peft_name), {})[ab] = v

    name_by_peft = {v: k for k, v in _PEFT_NAME.items()}
    L = base_params["layers"]["q_proj"]["kernel"].shape[0]

    def build(name):
        peft_name = _PEFT_NAME[name]
        if (0, peft_name) not in grouped:
            return None
        A = np.stack([grouped[(i, peft_name)]["A"].T for i in range(L)])
        B = np.stack([grouped[(i, peft_name)]["B"].T for i in range(L)])
        return {"A": jnp.asarray(A, dtype), "B": jnp.asarray(B, dtype)}

    def walk(node, prefix):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                p = f"{prefix}/{k}" if prefix else k
                if (k == "kernel" and prefix.split("/")[-1] in _PEFT_NAME
                        and prefix.startswith("layers")):
                    out[k] = build(prefix.split("/")[-1])
                else:
                    out[k] = walk(v, p)
            return out
        return None

    tree = walk(base_params, "")
    del name_by_peft
    return tree, cfg


def save_peft_dir(path: str, lora_params, cfg: LoraConfig,
                  base_model_name: str = ""):
    """Write this repo's decoder LoRA tree as a PEFT adapter dir."""
    os.makedirs(path, exist_ok=True)
    tensors = {}
    layers = lora_params["layers"]
    for name, peft_name in _PEFT_NAME.items():
        sub = layers.get(name)
        if not isinstance(sub, dict):
            continue
        leaf = sub.get("kernel")
        if not isinstance(leaf, dict):
            continue
        A, B = np.asarray(leaf["A"]), np.asarray(leaf["B"])
        for i in range(A.shape[0]):
            pre = f"base_model.model.model.layers.{i}.{peft_name}"
            # safetensors serializes the raw buffer — transposed VIEWS must
            # be materialized contiguous
            tensors[f"{pre}.lora_A.weight"] = np.ascontiguousarray(
                A[i].T, np.float32)
            tensors[f"{pre}.lora_B.weight"] = np.ascontiguousarray(
                B[i].T, np.float32)

    from safetensors.numpy import save_file

    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    targets = sorted({
        n.split(".")[-1] for n in _PEFT_NAME.values()
        if isinstance(layers.get(
            {v: k for k, v in _PEFT_NAME.items()}[n], None), dict)})
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({
            "peft_type": "LORA",
            "r": cfg.r,
            "lora_alpha": cfg.alpha,
            "lora_dropout": 0.0,
            "target_modules": targets,
            "bias": "none",
            "base_model_name_or_path": base_model_name,
            "task_type": "CAUSAL_LM",
        }, f, indent=2)
    return path
