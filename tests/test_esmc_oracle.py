"""Differential oracle for the ESMC encoder (VERDICT round-1 weak #5).

The `esm` package is not importable in this environment, so this file
hand-writes a minimal torch oracle of the public ESMC block semantics
(EvolutionaryScale esm: models/esmc.py + layers/blocks.py, consumed by the
reference at esmc_qwen_arc.py:80-86):

  embed → n_layers x [ LN → fused qkv (bias-free) → q/k LayerNorm over
  d_model → per-head rotary (split-half convention, theta 1e4) → SDPA →
  out_proj; residual scaled by 1/sqrt(n_layers/36); LN → Linear(d, 2f) →
  SwiGLU → Linear(f, d), same residual scaling ] → final LN

The oracle operates directly on an esm-style torch state dict
(transformer.blocks.{i}.attn.layernorm_qkv.{0,1}, attn.{q_ln,k_ln,out_proj},
ffn.{0,1,3}, transformer.norm, embed) so the test also exercises
esmc_params_from_torch's key-layout conversion — the same style of oracle
test_rgcn.py uses for the RGCN.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from prot2text_tpu.models.esmc import (
    ESMCConfig, esmc_encode, esmc_params_from_torch,
)

torch.manual_seed(0)


# ---------------------------------------------------------------- oracle --

def _ln(x, w, eps, b=None):
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    y = (x - mu) / torch.sqrt(var + eps) * w
    return y if b is None else y + b


def _rotary(x, theta):
    """x: (B, H, S, D) — split-half rotary, fp32."""
    B, H, S, D = x.shape
    inv = 1.0 / (theta ** (torch.arange(0, D, 2, dtype=torch.float64) / D))
    freqs = torch.outer(torch.arange(S, dtype=torch.float64), inv)
    emb = torch.cat([freqs, freqs], dim=-1)  # (S, D)
    cos, sin = emb.cos().float(), emb.sin().float()
    x1, x2 = x[..., : D // 2], x[..., D // 2:]
    rot = torch.cat([-x2, x1], dim=-1)
    return x * cos + rot * sin


def esmc_oracle(sd, cfg: ESMCConfig, ids, mask, collect_layers=False):
    """Pure-torch fp32 forward over an esm-style state dict."""
    eps = cfg.layer_norm_eps
    H, D = cfg.n_heads, cfg.head_dim
    x = sd["embed.weight"][ids]
    B, S, d = x.shape
    scaling = float(np.sqrt(cfg.n_layers / 36.0))
    neg = torch.finfo(torch.float32).min
    kmask = (mask == 0)[:, None, None, :]  # (B,1,1,S) True = masked key
    per_layer = []
    for i in range(cfg.n_layers):
        p = f"transformer.blocks.{i}"
        # --- attention sublayer
        xn = _ln(x, sd[f"{p}.attn.layernorm_qkv.0.weight"], eps,
                 sd.get(f"{p}.attn.layernorm_qkv.0.bias"))
        qkv = xn @ sd[f"{p}.attn.layernorm_qkv.1.weight"].T
        q, k, v = qkv.chunk(3, dim=-1)
        q = _ln(q, sd[f"{p}.attn.q_ln.weight"], eps)
        k = _ln(k, sd[f"{p}.attn.k_ln.weight"], eps)
        q = q.view(B, S, H, D).permute(0, 2, 1, 3)
        k = k.view(B, S, H, D).permute(0, 2, 1, 3)
        v = v.view(B, S, H, D).permute(0, 2, 1, 3)
        q, k = _rotary(q, cfg.rope_theta), _rotary(k, cfg.rope_theta)
        scores = (q @ k.transpose(-1, -2)) / np.sqrt(D)
        scores = scores.masked_fill(kmask, neg)
        a = torch.softmax(scores, dim=-1) @ v
        a = a.permute(0, 2, 1, 3).reshape(B, S, H * D)
        x = x + (a @ sd[f"{p}.attn.out_proj.weight"].T) / scaling
        # --- SwiGLU feed-forward sublayer
        xn = _ln(x, sd[f"{p}.ffn.0.weight"], eps,
                 sd.get(f"{p}.ffn.0.bias"))
        g = xn @ sd[f"{p}.ffn.1.weight"].T
        g1, g2 = g.chunk(2, dim=-1)
        y = torch.nn.functional.silu(g1) * g2
        x = x + (y @ sd[f"{p}.ffn.3.weight"].T) / scaling
        if collect_layers:
            per_layer.append(x.clone())
    out = _ln(x, sd["transformer.norm.weight"], eps)
    return (out, per_layer) if collect_layers else out


# ----------------------------------------------------------------- tests --

CFG = ESMCConfig(vocab_size=64, d_model=64, n_layers=3, n_heads=4)


def _random_sd(cfg: ESMCConfig, full_keys=False):
    """full_keys=True fabricates the COMPLETE esm-package ESMC state-dict
    layout: LayerNorm biases on layernorm_qkv.0 / ffn.0 (plain nn.LayerNorm
    defaults in esm layers/attention.py + layers/ffn.py; q_ln/k_ln and
    transformer.norm are bias=False) plus the sequence_head the encoder
    path ignores."""
    d, f = cfg.d_model, cfg.ffn_dim
    sd = {"embed.weight": torch.randn(cfg.vocab_size, d) * 0.5}
    for i in range(cfg.n_layers):
        p = f"transformer.blocks.{i}"
        sd[f"{p}.attn.layernorm_qkv.0.weight"] = 1 + 0.1 * torch.randn(d)
        if full_keys:
            sd[f"{p}.attn.layernorm_qkv.0.bias"] = 0.1 * torch.randn(d)
            sd[f"{p}.ffn.0.bias"] = 0.1 * torch.randn(d)
        sd[f"{p}.attn.layernorm_qkv.1.weight"] = torch.randn(3 * d, d) * 0.1
        sd[f"{p}.attn.q_ln.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.attn.k_ln.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.attn.out_proj.weight"] = torch.randn(d, d) * 0.1
        sd[f"{p}.ffn.0.weight"] = 1 + 0.1 * torch.randn(d)
        sd[f"{p}.ffn.1.weight"] = torch.randn(2 * f, d) * 0.1
        sd[f"{p}.ffn.3.weight"] = torch.randn(d, f) * 0.1
    sd["transformer.norm.weight"] = 1 + 0.1 * torch.randn(d)
    if full_keys:
        sd["sequence_head.0.weight"] = torch.randn(d, d) * 0.1
        sd["sequence_head.0.bias"] = torch.zeros(d)
        sd["sequence_head.2.weight"] = torch.ones(d)
        sd["sequence_head.2.bias"] = torch.zeros(d)
        sd["sequence_head.3.weight"] = torch.randn(cfg.vocab_size, d) * 0.1
        sd["sequence_head.3.bias"] = torch.zeros(cfg.vocab_size)
    return sd


def _batch(B=3, S=11):
    rng = np.random.default_rng(7)
    ids = rng.integers(4, 29, (B, S))
    mask = np.ones((B, S), np.int64)
    for b in range(B):
        L = 5 + 2 * b
        ids[b, 0] = 0                      # bos/cls
        ids[b, L - 1] = 2                  # eos
        ids[b, L:] = 1                     # pad (right)
        mask[b, L:] = 0
    return ids, mask


def test_esmc_end_to_end_matches_torch_oracle():
    sd = _random_sd(CFG)
    ids, mask = _batch()
    want = esmc_oracle(sd, CFG, torch.as_tensor(ids), torch.as_tensor(mask))
    params = esmc_params_from_torch(sd, CFG.n_layers, jnp.float32)
    got = esmc_encode(CFG, params, jnp.asarray(ids), jnp.asarray(mask))
    got = np.asarray(got)
    want = want.numpy()
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-4, rtol=2e-4)


def test_esmc_per_layer_matches_torch_oracle():
    """Per-layer residual streams agree — localizes any numerics drift."""
    import jax

    sd = _random_sd(CFG)
    ids, mask = _batch(B=2, S=9)
    params = esmc_params_from_torch(sd, CFG.n_layers, jnp.float32)
    valid = mask.astype(bool)
    for k in range(1, CFG.n_layers + 1):
        # truncated stacks with identity final LN on both sides; note the
        # residue scaling intentionally stays the FULL model's n_layers via
        # the config so both sides use sqrt(k/36) consistently here
        sub_cfg = ESMCConfig(
            vocab_size=CFG.vocab_size, d_model=CFG.d_model, n_layers=k,
            n_heads=CFG.n_heads)
        sub_params = {
            "embed": params["embed"],
            "layers": jax.tree_util.tree_map(
                lambda a: a[:k], params["layers"]),
            "final_ln": {"scale": jnp.ones((CFG.d_model,))},
        }
        got = esmc_encode(sub_cfg, sub_params, jnp.asarray(ids),
                          jnp.asarray(mask))
        sub_sd = dict(sd)
        sub_sd["transformer.norm.weight"] = torch.ones(CFG.d_model)
        want = esmc_oracle(
            sub_sd, sub_cfg, torch.as_tensor(ids), torch.as_tensor(mask))
        np.testing.assert_allclose(
            np.asarray(got)[valid], want.numpy()[valid],
            atol=2e-4, rtol=2e-4, err_msg=f"layer {k}")


def test_esmc_padding_invariance():
    """Extra right-padding must not change valid-token embeddings."""
    sd = _random_sd(CFG)
    ids, mask = _batch(B=2, S=9)
    params = esmc_params_from_torch(sd, CFG.n_layers, jnp.float32)
    out1 = np.asarray(esmc_encode(CFG, params, jnp.asarray(ids),
                                  jnp.asarray(mask)))
    pad = np.full((2, 4), 1)
    ids2 = np.concatenate([ids, pad], axis=1)
    mask2 = np.concatenate([mask, np.zeros((2, 4), np.int64)], axis=1)
    out2 = np.asarray(esmc_encode(CFG, params, jnp.asarray(ids2),
                                  jnp.asarray(mask2)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(out2[:, :9][valid], out1[valid],
                               atol=1e-5, rtol=1e-5)


def test_esmc_full_esm_package_layout_with_biases():
    """VERDICT r2 #4: esmc_params_from_torch against an esm-package-layout
    state dict with EVERY key present — incl. the LayerNorm biases real
    checkpoints carry on layernorm_qkv.0 / ffn.0 (silently dropped before
    round 3) and the sequence_head keys the encoder path must ignore."""
    sd = _random_sd(CFG, full_keys=True)
    ids, mask = _batch()
    want = esmc_oracle(sd, CFG, torch.as_tensor(ids), torch.as_tensor(mask))
    params = esmc_params_from_torch(sd, CFG.n_layers, jnp.float32)
    # the conversion must carry the biases
    assert "bias" in params["layers"]["attn_ln"]
    assert "bias" in params["layers"]["ffn_ln"]
    assert "bias" not in params["layers"]["q_ln"]
    got = np.asarray(esmc_encode(CFG, params, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want.numpy()[valid],
                               atol=2e-4, rtol=2e-4)
