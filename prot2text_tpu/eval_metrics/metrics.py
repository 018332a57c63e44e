"""Generation-quality metrics (exact match, BLEU-2/4, ROUGE, BERTScore).

Mirrors reference scripts/benchmark.py:30-105 without the `evaluate` package
(not in this image):
  * exact match — identical normalization (lowercase, strip non-word chars,
    benchmark.py:31-42)
  * BLEU — Papineni corpus BLEU with tokenizer_13a pre-tokenization, the same
    algorithm `evaluate`'s "bleu" metric wraps; max_order=2 and 4
    (benchmark.py:45-52)
  * ROUGE — rouge1/rouge2/rougeL/rougeLsum fmeasure averages via
    `rouge_score` (the library `evaluate`'s "rouge" wraps); we average
    instead of bootstrap-aggregating (deterministic; identical in
    expectation)
  * BERTScore — the greedy-cosine-matching algorithm implemented natively
    (works with ANY contextual-embedding function, e.g. this repo's encoders
    or a local HF roberta/biobert checkpoint); the reference's 495-token
    re-tokenization truncation is the caller's responsibility since it is
    tokenizer-specific (benchmark.py:60-105)
"""

from __future__ import annotations

import collections
import math
import re
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


def _normalize_exact(text: str) -> str:
    return re.sub(r"[^\w]", "", text.lower())


def compute_exact_match(predictions: Sequence[str],
                        references: Sequence[str]) -> float:
    hits = sum(
        _normalize_exact(p) == _normalize_exact(r)
        for p, r in zip(predictions, references))
    return hits / len(predictions)


# ---------------------------------------------------------------------------
# BLEU


def _tokenize_13a(line: str) -> List[str]:
    """sacrebleu tokenizer_13a (the default pre-tokenizer of HF evaluate's
    bleu metric); fall back to whitespace if sacrebleu is unavailable."""
    try:
        from sacrebleu.tokenizers.tokenizer_13a import Tokenizer13a

        return Tokenizer13a()(line).split()
    except Exception:
        return line.split()


def _ngrams(tokens: List[str], n: int):
    counts: collections.Counter = collections.Counter()
    for i in range(len(tokens) - n + 1):
        counts[tuple(tokens[i:i + n])] += 1
    return counts


def compute_bleu(predictions: Sequence[str], references: Sequence[str],
                 max_order: int = 4) -> Dict[str, Any]:
    """Corpus BLEU (no smoothing), same output keys as evaluate's bleu."""
    pred_toks = [_tokenize_13a(p) for p in predictions]
    ref_toks = [_tokenize_13a(r) for r in references]

    matches = [0] * max_order
    possible = [0] * max_order
    pred_len = 0
    ref_len = 0
    for p, r in zip(pred_toks, ref_toks):
        pred_len += len(p)
        ref_len += len(r)
        for n in range(1, max_order + 1):
            pc = _ngrams(p, n)
            rc = _ngrams(r, n)
            overlap = sum((pc & rc).values())
            matches[n - 1] += overlap
            possible[n - 1] += max(len(p) - n + 1, 0)

    precisions = [
        (matches[i] / possible[i]) if possible[i] > 0 else 0.0
        for i in range(max_order)
    ]
    if min(precisions) > 0:
        log_mean = sum(math.log(p) for p in precisions) / max_order
        geo_mean = math.exp(log_mean)
    else:
        geo_mean = 0.0
    ratio = pred_len / ref_len if ref_len > 0 else 0.0
    bp = 1.0 if ratio > 1.0 else (math.exp(1 - 1 / ratio) if ratio > 0 else 0.0)
    return {
        "bleu": geo_mean * bp,
        "precisions": precisions,
        "brevity_penalty": bp,
        "length_ratio": ratio,
        "translation_length": pred_len,
        "reference_length": ref_len,
    }


# ---------------------------------------------------------------------------
# ROUGE


def compute_rouge(predictions: Sequence[str],
                  references: Sequence[str]) -> Dict[str, float]:
    from rouge_score import rouge_scorer

    # evaluate's rouge defaults: use_stemmer=False, rougeLsum splits on
    # newlines (no nltk sentence tokenizer — unavailable offline anyway)
    kinds = ["rouge1", "rouge2", "rougeL", "rougeLsum"]
    scorer = rouge_scorer.RougeScorer(kinds, use_stemmer=False)
    sums = {k: 0.0 for k in kinds}
    for p, r in zip(predictions, references):
        scores = scorer.score(r, p)
        for k in kinds:
            sums[k] += scores[k].fmeasure
    n = len(predictions)
    return {k: sums[k] / n for k in kinds}


# ---------------------------------------------------------------------------
# BERTScore (greedy cosine matching; embedding-function agnostic)


def bert_score_from_embeddings(
    pred_embs: Sequence[np.ndarray],
    ref_embs: Sequence[np.ndarray],
    pred_idf: Optional[Sequence[np.ndarray]] = None,
    ref_idf: Optional[Sequence[np.ndarray]] = None,
) -> Dict[str, float]:
    """BERTScore P/R/F1 from per-sentence token embeddings (T_i, H).

    R = mean_j max_i cos(ref_j, pred_i); P = mean_i max_j cos(pred_i, ref_j);
    F1 = 2PR/(P+R) — averaged over the corpus (bert_score reference
    algorithm, as invoked at benchmark.py:77-105)."""
    ps, rs, fs = [], [], []
    for bi, (pe, re_) in enumerate(zip(pred_embs, ref_embs)):
        if pe.shape[0] == 0 or re_.shape[0] == 0:
            ps.append(0.0), rs.append(0.0), fs.append(0.0)
            continue
        pe = pe / np.maximum(
            np.linalg.norm(pe, axis=-1, keepdims=True), 1e-12)
        re_ = re_ / np.maximum(
            np.linalg.norm(re_, axis=-1, keepdims=True), 1e-12)
        sim = pe @ re_.T  # (Tp, Tr)
        w_p = (pred_idf[bi] if pred_idf is not None
               else np.ones(pe.shape[0]))
        w_r = (ref_idf[bi] if ref_idf is not None
               else np.ones(re_.shape[0]))
        p = float((sim.max(axis=1) * w_p).sum() / max(w_p.sum(), 1e-12))
        r = float((sim.max(axis=0) * w_r).sum() / max(w_r.sum(), 1e-12))
        f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
        ps.append(p)
        rs.append(r)
        fs.append(f)
    return {"precision": float(np.mean(ps)), "recall": float(np.mean(rs)),
            "f1": float(np.mean(fs))}


def idf_dict_from_references(
    tokenized_refs: Sequence[Sequence[int]],
    zero_ids: Sequence[int] = (),
) -> Dict[int, float]:
    """`bert_score.utils.get_idf_dict` formula: idf(w) = log((N+1)/(df+1))
    over the REFERENCE corpus (df = #ref sentences containing w);
    `zero_ids` (CLS/SEP) are forced to 0 — they still participate as match
    candidates, only their weight in the P/R averages is zero (the package
    does the same even with idf=False)."""
    import math

    n = len(tokenized_refs)
    df: Dict[int, int] = {}
    for toks in tokenized_refs:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    default = math.log((n + 1) / 1.0)
    idf = {t: math.log((n + 1) / (c + 1)) for t, c in df.items()}
    out: Dict[int, float] = dict(idf)
    for z in zero_ids:
        out[z] = 0.0
    out["__default__"] = default
    return out


def truncate_via_tokenizer(texts: Sequence[str], tokenizer,
                           max_tokens: int = 495) -> list:
    """The reference's pre-truncation contract (benchmark.py:60-105):
    tokenize each text with the SCORER's tokenizer at max_length=495, then
    batch-decode back to text with special tokens skipped, so the scorer
    itself never sees > 495 tokens (biobert max_position_embeddings=512)."""
    enc = tokenizer(list(texts), truncation=True, max_length=max_tokens)
    return tokenizer.batch_decode(enc["input_ids"],
                                  skip_special_tokens=True)


def compute_bert_score(
    predictions: Sequence[str],
    references: Sequence[str],
    embed_fn: Callable[[Sequence[str]], Sequence[np.ndarray]],
    max_tokens: int = 495,
    *,
    tokenizer=None,
    idf: bool = False,
) -> Dict[str, float]:
    """BERTScore with a caller-provided contextual embedding function
    (a local roberta-large/biobert checkpoint — cli/benchmark.py builds one
    from --bert_model_dir with the package's hidden_states[num_layers]
    convention).

    With `tokenizer` given, full reference parity: the 495-token
    round-trip truncation runs here, per-token weights are 1 with CLS/SEP
    zeroed (the package's idf=False convention), and `idf=True` switches
    to reference-corpus idf weights (idf_dict_from_references).
    `embed_fn(texts) -> (embs, token_ids)` may return token ids alongside
    embeddings; without them (plain `embed_fn(texts) -> embs`) weights
    default to all-ones as before."""
    predictions = list(predictions)
    references = list(references)
    if tokenizer is not None:
        predictions = truncate_via_tokenizer(predictions, tokenizer,
                                             max_tokens)
        references = truncate_via_tokenizer(references, tokenizer,
                                            max_tokens)
    out = embed_fn(predictions)
    out_r = embed_fn(references)
    if isinstance(out, tuple):
        pe, pt = out
        re_, rt = out_r
    else:
        pe, pt = out, None
        re_, rt = out_r, None
    pw = rw = None
    if tokenizer is not None and pt is not None:
        zero = tuple(t for t in (tokenizer.cls_token_id,
                                 tokenizer.sep_token_id,
                                 getattr(tokenizer, "bos_token_id", None),
                                 getattr(tokenizer, "eos_token_id", None))
                     if t is not None)
        if idf:
            idf_d = idf_dict_from_references(rt, zero_ids=zero)
            default = idf_d["__default__"]

            def w(toks):
                return np.asarray([idf_d.get(t, default) for t in toks],
                                  np.float64)
        else:
            def w(toks):
                return np.asarray([0.0 if t in zero else 1.0 for t in toks],
                                  np.float64)
        pw = [w(t) for t in pt]
        rw = [w(t) for t in rt]
    return bert_score_from_embeddings(pe, re_, pred_idf=pw, ref_idf=rw)


def make_hf_bert_embed_fn(model_dir: str, num_layers: Optional[int] = None):
    """Build the bert_score-package embedding convention from a local HF
    checkpoint: `hidden_states[num_layers]` (embedding output is index 0;
    the package's model2layers picks e.g. 17 for roberta-large, and the
    reference passes 24 for biobert — benchmark.py:98-99), special tokens
    INCLUDED (their P/R weight is zeroed downstream).  Returns
    (tokenizer, embed_fn) where embed_fn(texts) -> (embs, token_ids)."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir)
    model = AutoModel.from_pretrained(model_dir).eval()

    def embed(texts):
        embs, toks = [], []
        with torch.no_grad():
            for t in texts:
                enc = tok(t, truncation=True,
                          max_length=min(getattr(tok, "model_max_length",
                                                 512), 512),
                          return_tensors="pt")
                out = model(**enc, output_hidden_states=True)
                layer = (num_layers if num_layers is not None
                         else len(out.hidden_states) - 1)
                embs.append(out.hidden_states[layer][0].numpy())
                toks.append(enc["input_ids"][0].tolist())
        return embs, toks

    return tok, embed


# ---------------------------------------------------------------------------


def compute_metrics(
    predictions: Sequence[str],
    references: Sequence[str],
    *,
    evaluate_exact_match: bool = True,
    evaluate_bleu: bool = True,
    evaluate_rouge: bool = True,
    bert_embed_fns: Optional[Dict[str, Callable]] = None,
    bert_kwargs: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Reference compute_metrics flag surface (benchmark.py:108-141)."""
    out: Dict[str, Any] = {}
    if evaluate_exact_match:
        out["exact_match"] = compute_exact_match(predictions, references)
    if evaluate_bleu:
        out["bleu2"] = compute_bleu(predictions, references, max_order=2)
        out["bleu4"] = compute_bleu(predictions, references, max_order=4)
    if evaluate_rouge:
        out["rouge"] = compute_rouge(predictions, references)
    if bert_embed_fns:
        out["bert_score"] = {
            name: compute_bert_score(predictions, references, fn,
                                     **(bert_kwargs or {}))
            for name, fn in bert_embed_fns.items()
        }
    return out
