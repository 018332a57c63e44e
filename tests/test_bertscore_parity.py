"""BERTScore parity vs an independent reimplementation of the `bert_score`
package pipeline (VERDICT r2 missing #2).

The bert_score package is not installed in this image, so the oracle below
transcribes its scoring semantics (bert_score/utils.py greedy_cos_idf +
get_idf_dict, as driven by evaluate.load("bertscore") in the reference,
/root/reference/scripts/benchmark.py:60-105):

  * embeddings = model `hidden_states[num_layers]` (embedding output = 0)
  * L2-normalize, token-vs-token cosine matrix, greedy max both directions
  * per-token weights: idf=False → 1.0 with CLS/SEP forced to 0;
    idf=True → log((N+1)/(df+1)) over the REFERENCE corpus, CLS/SEP 0;
    special tokens still participate as match CANDIDATES either way
  * P/R = weighted means, F1 = harmonic, corpus mean over sentences

Driven end-to-end through a real (tiny, random) HF BertModel + WordPiece
tokenizer saved to disk — the same path cli/benchmark.py --bert_model_dir
takes — including the reference's 495-token round-trip truncation contract.
"""

import math
import os

import numpy as np
import pytest

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "protein", "binds", "atp", "with", "high", "affinity",
         "catalyzes", "hydrolysis", "of", "enzyme", "activity", "cell",
         "membrane", "##s", "##ing", "a", "in", "is", "an", "to", "dna"]


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    d = str(tmp_path_factory.mktemp("tiny_bert"))
    vocab_path = os.path.join(d, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    tok = BertTokenizerFast(vocab_file=vocab_path, do_lower_case=True)
    tok.save_pretrained(d)
    torch.manual_seed(0)
    model = BertModel(BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)).eval()
    model.save_pretrained(d)
    return d


PREDS = ["the protein binds atp with high affinity",
         "an enzyme catalyzes hydrolysis of atp",
         "dna binding protein"]
REFS = ["the protein binds atp",
        "the enzyme catalyzes atp hydrolysis in the cell",
        "protein binding to dna"]


def _package_oracle(model_dir, preds, refs, num_layers, idf):
    """Independent transcription of bert_score's greedy_cos_idf pipeline."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir)
    model = AutoModel.from_pretrained(model_dir).eval()

    # the reference's own pre-step (benchmark.py:64-73): tokenize at 495,
    # batch_decode back with special tokens skipped, feed THAT to bert_score
    def pre(texts):
        enc = tok(list(texts), truncation=True, max_length=495)
        return tok.batch_decode(enc["input_ids"], skip_special_tokens=True)

    preds = pre(preds)
    refs = pre(refs)

    def sent(texts):
        embs, ids = [], []
        for t in texts:
            enc = tok(t, truncation=True, max_length=512,
                      return_tensors="pt")
            with torch.no_grad():
                h = model(**enc, output_hidden_states=True
                          ).hidden_states[num_layers][0]
            embs.append(h.numpy())
            ids.append(enc["input_ids"][0].tolist())
        return embs, ids

    pe, pt = sent(preds)
    re_, rt = sent(refs)
    if idf:
        n = len(rt)
        df = {}
        for toks in rt:
            for t in set(toks):
                df[t] = df.get(t, 0) + 1
        idf_d = {t: math.log((n + 1) / (c + 1)) for t, c in df.items()}
        default = math.log(n + 1)

        def w(t):
            if t in (tok.cls_token_id, tok.sep_token_id):
                return 0.0
            return idf_d.get(t, default)
    else:
        def w(t):
            return 0.0 if t in (tok.cls_token_id, tok.sep_token_id) else 1.0

    ps, rs, fs = [], [], []
    for p_emb, p_ids, r_emb, r_ids in zip(pe, pt, re_, rt):
        p_emb = p_emb / np.linalg.norm(p_emb, axis=-1, keepdims=True)
        r_emb = r_emb / np.linalg.norm(r_emb, axis=-1, keepdims=True)
        sim = p_emb @ r_emb.T
        wp = np.array([w(t) for t in p_ids])
        wr = np.array([w(t) for t in r_ids])
        p = (sim.max(1) * wp).sum() / wp.sum()
        r = (sim.max(0) * wr).sum() / wr.sum()
        ps.append(p), rs.append(r), fs.append(2 * p * r / (p + r))
    return {"precision": float(np.mean(ps)), "recall": float(np.mean(rs)),
            "f1": float(np.mean(fs))}


@pytest.mark.parametrize("idf", [False, True])
@pytest.mark.parametrize("num_layers", [3, 2])
def test_bert_score_matches_package_pipeline(bert_dir, idf, num_layers):
    from prot2text_tpu.eval_metrics.metrics import (
        compute_bert_score, make_hf_bert_embed_fn)

    tok, embed = make_hf_bert_embed_fn(bert_dir, num_layers=num_layers)
    got = compute_bert_score(PREDS, REFS, embed, tokenizer=tok, idf=idf)
    want = _package_oracle(bert_dir, PREDS, REFS, num_layers, idf)
    for k in ("precision", "recall", "f1"):
        np.testing.assert_allclose(got[k], want[k], atol=1e-6,
                                   err_msg=f"{k} idf={idf} L={num_layers}")


def test_truncation_round_trip_contract(bert_dir):
    """Reference pre-truncation (benchmark.py:60-105): tokenize at
    max_length, decode back skipping special tokens — long inputs must be
    cut, short ones unchanged."""
    from transformers import AutoTokenizer

    from prot2text_tpu.eval_metrics.metrics import truncate_via_tokenizer

    tok = AutoTokenizer.from_pretrained(bert_dir)
    long = " ".join(["protein binds atp"] * 40)
    short = "the enzyme"
    out = truncate_via_tokenizer([long, short], tok, max_tokens=10)
    assert len(tok(out[0])["input_ids"]) <= 10
    assert out[1] == short
    # and compute_bert_score applies it before embedding (no crash from
    # > max_position_embeddings inputs)
    from prot2text_tpu.eval_metrics.metrics import (
        compute_bert_score, make_hf_bert_embed_fn)

    tok2, embed = make_hf_bert_embed_fn(bert_dir)
    res = compute_bert_score([long], [long], embed, max_tokens=10,
                             tokenizer=tok2)
    assert res["f1"] > 0.99     # identical texts → ~1


def test_idf_dict_formula():
    from prot2text_tpu.eval_metrics.metrics import idf_dict_from_references

    refs = [[2, 5, 6, 3], [2, 5, 7, 3], [2, 8, 3]]
    d = idf_dict_from_references(refs, zero_ids=(2, 3))
    assert d[2] == 0.0 and d[3] == 0.0
    np.testing.assert_allclose(d[5], math.log(4 / 3))   # df=2
    np.testing.assert_allclose(d[6], math.log(4 / 2))   # df=1
    np.testing.assert_allclose(d["__default__"], math.log(4))
