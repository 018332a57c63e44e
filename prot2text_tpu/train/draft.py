"""Training step for the Medusa draft heads (models/medusa.py).

Distillation against the frozen target decoder: run the target once over
a token batch, then train head k to predict token t+1+k from the target's
hidden state at position t (cross-entropy through the target's own
frozen lm_head).  Only the (K, H, H)+(K, H) head params receive
gradients — the decoder forward is wrapped in stop_gradient, so the step
costs one frozen forward + K tiny head matmuls.

The natural training corpus is the target's OWN greedy outputs (that is
what the serving verify round compares drafts against); any in-domain
text also works.  One jitted step; dp-shardable like the other trainers
(the loss is a per-token mean, grads psum implicitly under pjit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.decoder import (
    causal_bias_from_mask, decoder_forward, decoder_logits, embed_tokens,
)


def medusa_loss(core_cfg, dec_params, med_params, batch):
    """Mean CE of every head over every position with a valid target.

    batch: attention_mask (B, S) 0/1 plus either input_ids (B, S) int32
    (text-only distillation) or inputs_embeds (B, S, H) with labels
    (B, S) int32 where -100 marks non-token positions (the composed
    protein→text case: the prompt span is fused embeddings with no ids —
    exactly the instruct collator's label convention, data/collate.py).
    The hidden at position t already predicts the next token through the
    LM head; head k (0-based) predicts the token at t+2+k — matching the
    serving chunk layout [last_tok, d_1..d_K] where d_{k+1} is verified
    against the target's argmax k+1 tokens past the frontier token.
    Positions whose target lands on padding / -100 / past S are masked."""
    mask = batch["attention_mask"].astype(jnp.int32)
    if "inputs_embeds" in batch:
        emb = batch["inputs_embeds"]
        labels = batch["labels"]
    else:
        labels = batch["input_ids"]
        emb = embed_tokens(dec_params, labels)
    B, S = labels.shape
    K = med_params["w"].shape[0]

    bias = causal_bias_from_mask(mask)
    pos = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, None).astype(jnp.int32)
    h, _ = decoder_forward(core_cfg, dec_params, inputs_embeds=emb,
                           bias=bias, positions=pos)
    h = jax.lax.stop_gradient(h)                       # (B, S, H)

    # One head at a time: the (B, S, V) fp32 logits of a single head are
    # already the standard trainer's peak activation — materializing all
    # K at once ((B, S, K, V) + log_softmax temporaries, ~5 GB fp32 at the
    # 8B/V=128k defaults) would OOM next to the frozen tower.
    ll_sum = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.int32)
    for k in range(K):
        w_k = med_params["w"][k].astype(h.dtype)
        b_k = med_params["b"][k].astype(h.dtype)
        hk = h + jax.nn.silu(h @ w_k + b_k)            # (B, S, H)
        logp = jax.nn.log_softmax(
            decoder_logits(core_cfg, dec_params, hk), axis=-1)
        tgt_pos = jnp.arange(S) + (2 + k)              # labels[t+2+k]
        valid = tgt_pos < S
        tgt_pos = jnp.clip(tgt_pos, 0, S - 1)
        lbl = labels[:, tgt_pos]                       # (B, S)
        lbl_mask = ((mask[:, tgt_pos] > 0) & valid[None]
                    & (mask > 0) & (lbl >= 0))
        ll = jnp.take_along_axis(logp, jnp.maximum(lbl, 0)[..., None],
                                 axis=-1)[..., 0]
        ll_sum += jnp.where(lbl_mask, ll, 0.0).sum()
        count += lbl_mask.sum()
    return -(ll_sum / jnp.maximum(count, 1))


def make_medusa_train_step(core_cfg, tx):
    """Returns step(state, dec_params, batch) -> (state, loss); state holds
    the medusa head params (train.optim.TrainState)."""

    from .optim import apply_updates

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, dec_params, batch):
        loss, grads = jax.value_and_grad(
            lambda med: medusa_loss(core_cfg, dec_params, med, batch)
        )(state.params)
        return apply_updates(state, grads, tx), loss

    return step
