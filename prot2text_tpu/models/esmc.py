"""ESM-Cambrian (ESMC) protein encoder — pure-JAX, layer-scanned.

Reimplements the architecture of EvolutionaryScale's `ESMC` model as consumed
by the reference via `ESMC.from_pretrained("esmc_600m")` and
`ESMC.forward(sequence_tokens=...)` returning `.embeddings`
(reference models/esmc_qwen_arc.py:23-25, :80-84; esmc_config.py:9).

Architecture (public esm package, models/esmc.py + layers/blocks.py):
  * token embedding (64-entry table; sequence tokenizer uses the 33-token ESM
    alphabet, ids identical to ESM2's, padded table)
  * n_layers × block, residual scaled:  x += sublayer(x) / sqrt(n_layers/36)
      - attn: LN → fused qkv (no bias) → q/k LayerNorm over d_model (no bias)
        → per-head rotary (theta 10000) → SDPA → out_proj (no bias)
      - ffn: LN → Linear(d, 2*ffn_dim) → SwiGLU → Linear(ffn_dim, d), where
        ffn_dim = round-up-to-256(expansion_ratio * d_model)
  * final LayerNorm (no bias); `.embeddings` = normed hidden states

The reference's esmc_600m: 36 layers, d=1152, 18 heads. 300m: 30/960/15.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .transformer import (
    apply_rope, attention, layer_norm, make_attention_bias, rope_cos_sin,
)

# ESMC sequence tokenizer ids == ESM2 alphabet (cls=0, pad=1, eos=2, ...)
ESMC_PAD_ID = 1
ESMC_BOS_ID = 0
ESMC_EOS_ID = 2


def _swiglu_dim(expansion_ratio: float, d_model: int) -> int:
    return int(((expansion_ratio * d_model) + 255) // 256 * 256)


@dataclasses.dataclass(frozen=True)
class ESMCConfig:
    vocab_size: int = 64
    d_model: int = 1152
    n_layers: int = 36
    n_heads: int = 18
    expansion_ratio: float = 8 / 3
    rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def ffn_dim(self) -> int:
        return _swiglu_dim(self.expansion_ratio, self.d_model)

    @property
    def residue_scaling(self) -> float:
        return (self.n_layers / 36) ** 0.5

    @classmethod
    def esmc_600m(cls):
        return cls(d_model=1152, n_layers=36, n_heads=18)

    @classmethod
    def esmc_300m(cls):
        return cls(d_model=960, n_layers=30, n_heads=15)

    @classmethod
    def tiny(cls):
        return cls(d_model=64, n_layers=2, n_heads=4)


def init_esmc_params(cfg: ESMCConfig, key, dtype=jnp.float32):
    k = iter(jax.random.split(key, 8))
    d, f, L = cfg.d_model, cfg.ffn_dim, cfg.n_layers

    def dense(kk, din, dout):
        return {"kernel": jax.random.normal(kk, (din, dout), dtype) * 0.02}

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype)}

    def layer(kk):
        return {
            "attn_ln": ln(d),
            "qkv": dense(jax.random.fold_in(kk, 0), d, 3 * d),
            "q_ln": ln(d),
            "k_ln": ln(d),
            "out_proj": dense(jax.random.fold_in(kk, 1), d, d),
            "ffn_ln": ln(d),
            "ffn_in": dense(jax.random.fold_in(kk, 2), d, 2 * f),
            "ffn_out": dense(jax.random.fold_in(kk, 3), f, d),
        }

    base = next(k)
    leaves = [layer(jax.random.fold_in(base, i)) for i in range(L)]
    return {
        "embed": jax.random.normal(next(k), (cfg.vocab_size, d), dtype) * 0.02,
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *leaves),
        "final_ln": ln(d),
    }


def esmc_encode(
    cfg: ESMCConfig,
    params,
    input_ids,          # (B, S) right-padded with pad id 1
    attention_mask,     # (B, S) 0/1
    *,
    attn_impl: str = "xla",
    remat: bool = False,
    lora=None,          # optional LoRA tree (models/lora.py layout)
    lora_scale: float = 1.0,
):
    """Return `.embeddings`-equivalent per-token hidden states (B, S, D).
    LoRA targets mirror the reference PEFT config for ESMC
    (train_instruct.py:162-176): qkv (layernorm_qkv.1), out_proj,
    ffn_in (ffn.1), ffn_out (ffn.3) — applied as low-rank side paths."""
    from .transformer import linear_lora

    B, S = input_ids.shape
    H, D = cfg.n_heads, cfg.head_dim
    scale = 1.0 / cfg.residue_scaling
    lora_layers = lora["layers"] if lora is not None else None

    h = params["embed"][input_ids]
    bias = make_attention_bias(attention_mask, causal=False)
    cos, sin = rope_cos_sin(jnp.arange(S, dtype=jnp.int32), D, cfg.rope_theta)

    def block(lp, ll, x):
        def proj(name, x_):
            lo = None
            if ll is not None:
                from .lora import lora_at

                lo = lora_at(ll.get(name))
            return linear_lora(lp[name], lo, x_, lora_scale)

        xn = layer_norm(lp["attn_ln"], x, cfg.layer_norm_eps)
        qkv = proj("qkv", xn)
        q, kk, v = jnp.split(qkv, 3, axis=-1)
        q = layer_norm(lp["q_ln"], q, cfg.layer_norm_eps)
        kk = layer_norm(lp["k_ln"], kk, cfg.layer_norm_eps)
        q = q.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        kk = kk.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)
        q = (q.astype(jnp.float32) * (D ** -0.5)).astype(q.dtype)
        a = attention(q, kk, v, bias, impl=attn_impl)
        a = a.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        x = x + proj("out_proj", a) * scale
        xn = layer_norm(lp["ffn_ln"], x, cfg.layer_norm_eps)
        g = proj("ffn_in", xn)
        g1, g2 = jnp.split(g, 2, axis=-1)
        y = jax.nn.silu(g1.astype(jnp.float32)).astype(g2.dtype) * g2
        x = x + proj("ffn_out", y) * scale
        return x

    body = block
    if remat:
        body = jax.checkpoint(block, prevent_cse=False)

    def step(c, xs):
        lp, ll = xs
        return body(lp, ll, c), None

    h, _ = jax.lax.scan(step, h, (params["layers"], lora_layers))
    return layer_norm(params["final_ln"], h, cfg.layer_norm_eps)


def esmc_params_from_torch(sd, num_layers: int, dtype=jnp.float32):
    """Convert an `esm` package ESMC state dict (key layout:
    embed.weight, transformer.blocks.{i}.attn.layernorm_qkv.{0,1},
    attn.{q_ln,k_ln,out_proj}, ffn.{0,1,3}, transformer.norm)."""
    import numpy as np

    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().float().numpy()
        return np.asarray(x)

    def dense(prefix):
        return {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T, dtype)}

    def ln(prefix):
        p = {"scale": jnp.asarray(_np(sd[prefix + ".weight"]), dtype)}
        # real esm-package checkpoints carry biases on layernorm_qkv.0 and
        # ffn.0 (plain nn.LayerNorm defaults); q_ln/k_ln/transformer.norm
        # are constructed with bias=False (esm layers/attention.py)
        if prefix + ".bias" in sd:
            p["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]), dtype)
        return p

    layers = []
    for i in range(num_layers):
        pre = f"transformer.blocks.{i}"
        layers.append({
            "attn_ln": ln(f"{pre}.attn.layernorm_qkv.0"),
            "qkv": dense(f"{pre}.attn.layernorm_qkv.1"),
            "q_ln": ln(f"{pre}.attn.q_ln"),
            "k_ln": ln(f"{pre}.attn.k_ln"),
            "out_proj": dense(f"{pre}.attn.out_proj"),
            "ffn_ln": ln(f"{pre}.ffn.0"),
            "ffn_in": dense(f"{pre}.ffn.1"),
            "ffn_out": dense(f"{pre}.ffn.3"),
        })
    return {
        "embed": jnp.asarray(_np(sd["embed.weight"]), dtype),
        "layers": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *layers),
        "final_ln": ln("transformer.norm"),
    }
