"""HF checkpoint → JAX param-tree converters.

Works from any `state_dict()`-like mapping (torch tensors or numpy arrays) or
a directory of safetensors files.  Linear kernels are transposed to (in, out);
per-layer tensors are stacked along a leading (n_layers, ...) scan axis.

This is the weight-porting step of SURVEY.md §7 build order #2; it gives the
golden-parity anchor against HF EsmModel / LlamaForCausalLM / Qwen3ForCausalLM
(the modules the reference composes at modeling_esm2llama_instruct.py:90-95).
"""

from __future__ import annotations

import os
from typing import Mapping

import jax.numpy as jnp
import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _dense(sd, prefix, dtype, bias=True):
    p = {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T, dtype)}
    if bias and prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]), dtype)
    return p


def _ln(sd, prefix, dtype):
    p = {"scale": jnp.asarray(_np(sd[prefix + ".weight"]), dtype)}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]), dtype)
    return p


def _stack(trees):
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def load_state_dict_dir(path: str) -> dict:
    """Load all *.safetensors (or pytorch_model.bin) under `path`."""
    sd = {}
    names = sorted(os.listdir(path))
    st_files = [n for n in names if n.endswith(".safetensors")]
    if st_files:
        from safetensors import safe_open

        for n in st_files:
            with safe_open(os.path.join(path, n), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    bins = [n for n in names if n.endswith(".bin")]
    if bins:
        import torch

        for n in bins:
            sd.update(torch.load(os.path.join(path, n), map_location="cpu",
                                 weights_only=True))
        return sd
    raise FileNotFoundError(f"no checkpoint files in {path}")


def _strip_prefix(sd: Mapping, prefixes) -> dict:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# ESM2


def esm2_params_from_hf(sd: Mapping, num_layers: int, dtype=jnp.float32):
    """Convert an HF `EsmModel` state dict (with or without 'esm.' prefix)."""
    sd = _strip_prefix(sd, ("esm.", "esm_encoder."))
    layers = []
    for i in range(num_layers):
        pre = f"encoder.layer.{i}"
        layers.append({
            "attn_ln": _ln(sd, f"{pre}.attention.LayerNorm", dtype),
            "query": _dense(sd, f"{pre}.attention.self.query", dtype),
            "key": _dense(sd, f"{pre}.attention.self.key", dtype),
            "value": _dense(sd, f"{pre}.attention.self.value", dtype),
            "attn_out": _dense(sd, f"{pre}.attention.output.dense", dtype),
            "mlp_ln": _ln(sd, f"{pre}.LayerNorm", dtype),
            "intermediate": _dense(sd, f"{pre}.intermediate.dense", dtype),
            "output": _dense(sd, f"{pre}.output.dense", dtype),
        })
    return {
        "word_embeddings": jnp.asarray(
            _np(sd["embeddings.word_embeddings.weight"]), dtype),
        "layers": _stack(layers),
        "final_ln": _ln(sd, "encoder.emb_layer_norm_after", dtype),
    }


# ---------------------------------------------------------------------------
# Llama / Qwen3 (shared decoder layout)


def decoder_params_from_hf(sd: Mapping, num_layers: int, dtype=jnp.float32,
                           qk_norm: bool = False,
                           tie_word_embeddings: bool = False):
    sd = _strip_prefix(sd, ("model.",))
    layers = []
    for i in range(num_layers):
        pre = f"layers.{i}"
        p = {
            "input_ln": _ln(sd, f"{pre}.input_layernorm", dtype),
            "q_proj": _dense(sd, f"{pre}.self_attn.q_proj", dtype),
            "k_proj": _dense(sd, f"{pre}.self_attn.k_proj", dtype),
            "v_proj": _dense(sd, f"{pre}.self_attn.v_proj", dtype),
            "o_proj": _dense(sd, f"{pre}.self_attn.o_proj", dtype),
            "post_attn_ln": _ln(sd, f"{pre}.post_attention_layernorm", dtype),
            "gate_proj": _dense(sd, f"{pre}.mlp.gate_proj", dtype),
            "up_proj": _dense(sd, f"{pre}.mlp.up_proj", dtype),
            "down_proj": _dense(sd, f"{pre}.mlp.down_proj", dtype),
        }
        if qk_norm:
            p["q_norm"] = _ln(sd, f"{pre}.self_attn.q_norm", dtype)
            p["k_norm"] = _ln(sd, f"{pre}.self_attn.k_norm", dtype)
        layers.append(p)
    params = {
        "embed_tokens": jnp.asarray(_np(sd["embed_tokens.weight"]), dtype),
        "layers": _stack(layers),
        "final_ln": _ln(sd, "norm", dtype),
    }
    if not tie_word_embeddings:
        if "lm_head.weight" in sd:
            params["lm_head"] = {
                "kernel": jnp.asarray(_np(sd["lm_head.weight"]).T, dtype)}
        else:
            params["lm_head"] = {"kernel": params["embed_tokens"].T}
    return params


llama_params_from_hf = decoder_params_from_hf


def qwen3_params_from_hf(sd: Mapping, num_layers: int, dtype=jnp.float32,
                         tie_word_embeddings: bool = False):
    return decoder_params_from_hf(sd, num_layers, dtype, qk_norm=True,
                                  tie_word_embeddings=tie_word_embeddings)
