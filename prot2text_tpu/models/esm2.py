"""ESM2 protein encoder — pure-JAX, layer-scanned, TPU-first.

Numerically matches HF `EsmModel` (transformers models/esm/modeling_esm.py)
as consumed by the reference at models/modeling_esm2llama_instruct.py:90-93:
  * token-dropout embedding scaling: mask positions zeroed, embeddings scaled
    by (1-0.12)/(1-observed_mask_ratio)  [HF EsmEmbeddings.forward]
  * embeddings multiplied by the attention mask
  * pre-LN blocks: h += Wo·attn(LN(h)); h += W2·gelu_erf(W1·LN(h))
  * query scaled by head_dim**-0.5 BEFORE rotary (ESM quirk, HF
    EsmSelfAttention: "we scale the query here ... and fix rotary")
  * rotary over absolute index arange(S) (padding-agnostic), theta=10000
  * final LayerNorm (`emb_layer_norm_after`)

The pooler/contact head are deliberately absent — the reference builds
EsmModel with `add_pooling_layer=False` and the legacy wrapper strips the
contact head (modeling_esm2llama_legacy.py:51-54).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .transformer import (
    apply_rope, attention, gelu_erf, layer_norm, linear, make_attention_bias,
    rope_cos_sin, scan_layers,
)

# ESM2 alphabet (fixed across all ESM2 checkpoints)
ESM2_VOCAB = [
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
]


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    vocab_size: int = 33
    hidden_size: int = 320
    num_layers: int = 6
    num_heads: int = 20
    intermediate_size: int = 1280
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    mask_token_id: int = 32
    token_dropout: bool = True
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    # published checkpoint shapes
    @classmethod
    def t6_8M(cls):
        return cls(hidden_size=320, num_layers=6, num_heads=20,
                   intermediate_size=1280)

    @classmethod
    def t12_35M(cls):
        return cls(hidden_size=480, num_layers=12, num_heads=20,
                   intermediate_size=1920)

    @classmethod
    def t30_150M(cls):
        return cls(hidden_size=640, num_layers=30, num_heads=20,
                   intermediate_size=2560)

    @classmethod
    def t33_650M(cls):
        return cls(hidden_size=1280, num_layers=33, num_heads=20,
                   intermediate_size=5120)

    @classmethod
    def t36_3B(cls):
        return cls(hidden_size=2560, num_layers=36, num_heads=40,
                   intermediate_size=10240)


def init_esm2_params(cfg: ESM2Config, key, dtype=jnp.float32):
    k = iter(jax.random.split(key, 64))

    def dense(kin, dout, din):
        return {
            "kernel": jax.random.normal(kin, (din, dout), dtype) * 0.02,
            "bias": jnp.zeros((dout,), dtype),
        }

    def ln(dim):
        return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    h, m, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def stack(make):
        base = next(k)
        leaves = [make(jax.random.fold_in(base, i)) for i in range(L)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *leaves)

    layer = stack(lambda kk: {
        "attn_ln": ln(h),
        "query": dense(jax.random.fold_in(kk, 0), h, h),
        "key": dense(jax.random.fold_in(kk, 1), h, h),
        "value": dense(jax.random.fold_in(kk, 2), h, h),
        "attn_out": dense(jax.random.fold_in(kk, 3), h, h),
        "mlp_ln": ln(h),
        "intermediate": dense(jax.random.fold_in(kk, 4), m, h),
        "output": dense(jax.random.fold_in(kk, 5), h, m),
    })
    return {
        "word_embeddings": jax.random.normal(
            next(k), (cfg.vocab_size, h), dtype) * 0.02,
        "layers": layer,
        "final_ln": ln(h),
    }


def _embed(cfg: ESM2Config, params, input_ids, attention_mask):
    emb = params["word_embeddings"][input_ids]
    if cfg.token_dropout:
        is_mask = (input_ids == cfg.mask_token_id)
        emb = jnp.where(is_mask[..., None], 0.0, emb)
        mask_ratio_train = 0.15 * 0.8
        src_len = attention_mask.sum(-1).astype(jnp.float32)
        observed = is_mask.sum(-1).astype(jnp.float32) / src_len
        scale = (1.0 - mask_ratio_train) / (1.0 - observed)
        emb = (emb.astype(jnp.float32) * scale[:, None, None]).astype(emb.dtype)
    emb = emb * attention_mask[..., None].astype(emb.dtype)
    return emb


def esm2_encode(
    cfg: ESM2Config,
    params,
    input_ids=None,      # (B, S) int32, right-padded with pad_token_id
    attention_mask=None,  # (B, S) 0/1
    *,
    inputs_embeds=None,  # (B, S, H) — bypasses embedding+token-dropout (the
                         # reference's protein_inputs_embeds path,
                         # modeling_esm2llama_instruct.py:154, :180)
    attn_impl: str = "xla",
    remat: bool = False,
):
    """Return per-token hidden states (B, S, H)."""
    if inputs_embeds is not None:
        B, S, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        h = inputs_embeds * attention_mask[..., None].astype(
            inputs_embeds.dtype)
    else:
        B, S = input_ids.shape
        h = _embed(cfg, params, input_ids, attention_mask)
    H, D = cfg.num_heads, cfg.head_dim
    bias = make_attention_bias(attention_mask, causal=False)
    positions = jnp.arange(S, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, D, cfg.rope_theta)

    def block(lp, x):
        xn = layer_norm(lp["attn_ln"], x, cfg.layer_norm_eps)
        q = linear(lp["query"], xn).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = linear(lp["key"], xn).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = linear(lp["value"], xn).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        # ESM scales q before rotary (HF EsmSelfAttention)
        q = (q.astype(jnp.float32) * (D ** -0.5)).astype(q.dtype)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        a = attention(q, k, v, bias, impl=attn_impl)
        a = a.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        x = x + linear(lp["attn_out"], a)
        xn = layer_norm(lp["mlp_ln"], x, cfg.layer_norm_eps)
        y = gelu_erf(linear(lp["intermediate"], xn))
        x = x + linear(lp["output"], y)
        return x

    h = scan_layers(block, params["layers"], h, cfg.num_layers, remat)
    h = layer_norm(params["final_ln"], h, cfg.layer_norm_eps)
    return h
