"""Metric tests: BLEU vs nltk oracle, exact-match normalization, ROUGE
sanity, BERTScore greedy-matching oracle, checkpoint round-trip."""

import numpy as np

from prot2text_tpu.eval_metrics.metrics import (
    bert_score_from_embeddings, compute_bleu, compute_exact_match,
    compute_metrics, compute_rouge,
)


def test_exact_match_normalization():
    preds = ["Hello, World!", "Protein kinase.", "no match"]
    refs = ["hello world", "protein-kinase", "different"]
    assert compute_exact_match(preds, refs) == 2 / 3


def test_bleu_against_nltk():
    from nltk.translate.bleu_score import corpus_bleu

    preds = [
        "the cat sat on the mat",
        "proteins catalyze reactions in cells",
    ]
    refs = [
        "the cat is on the mat",
        "proteins catalyze many reactions in living cells",
    ]
    out = compute_bleu(preds, refs, max_order=4)
    # nltk with identical tokenization (13a ~ whitespace for these strings)
    nltk_bleu = corpus_bleu(
        [[r.split()] for r in refs], [p.split() for p in preds])
    assert abs(out["bleu"] - nltk_bleu) < 1e-9
    # bleu2 >= bleu4 for these partial matches
    out2 = compute_bleu(preds, refs, max_order=2)
    assert out2["bleu"] >= out["bleu"]


def test_bleu_perfect_and_zero():
    assert compute_bleu(["a b c d"], ["a b c d"])["bleu"] == 1.0
    assert compute_bleu(["x y z w"], ["a b c d"])["bleu"] == 0.0


def test_rouge_sanity():
    out = compute_rouge(["the cat sat"], ["the cat sat"])
    assert out["rouge1"] == 1.0 and out["rougeL"] == 1.0
    out = compute_rouge(["completely different"], ["the cat sat"])
    assert out["rouge1"] == 0.0


def test_bert_score_oracle():
    rng = np.random.default_rng(0)
    pe = [rng.standard_normal((4, 8)), rng.standard_normal((3, 8))]
    re_ = [rng.standard_normal((5, 8)), rng.standard_normal((3, 8))]
    out = bert_score_from_embeddings(pe, re_)
    # oracle for sentence 0
    a = pe[0] / np.linalg.norm(pe[0], axis=-1, keepdims=True)
    b = re_[0] / np.linalg.norm(re_[0], axis=-1, keepdims=True)
    sim = a @ b.T
    p0 = sim.max(axis=1).mean()
    r0 = sim.max(axis=0).mean()
    f0 = 2 * p0 * r0 / (p0 + r0)
    # identical embeddings → perfect score
    ident = bert_score_from_embeddings([pe[0]], [pe[0]])
    assert abs(ident["f1"] - 1.0) < 1e-6
    # recompute corpus mean with sentence-1 oracle
    a1 = pe[1] / np.linalg.norm(pe[1], axis=-1, keepdims=True)
    b1 = re_[1] / np.linalg.norm(re_[1], axis=-1, keepdims=True)
    s1 = a1 @ b1.T
    p1, r1 = s1.max(axis=1).mean(), s1.max(axis=0).mean()
    f1 = 2 * p1 * r1 / (p1 + r1)
    assert abs(out["f1"] - np.mean([f0, f1])) < 1e-6


def test_compute_metrics_flags():
    out = compute_metrics(["a b"], ["a b"], evaluate_rouge=False)
    assert "exact_match" in out and "bleu2" in out and "rouge" not in out


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from prot2text_tpu.core.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint,
    )

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7)}
    save_checkpoint(str(tmp_path), 7, tree)
    save_checkpoint(str(tmp_path), 12, tree)
    assert latest_step(str(tmp_path)) == 12
    restored = restore_checkpoint(str(tmp_path), step=7)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    restored2 = restore_checkpoint(str(tmp_path), target=tree)
    assert int(restored2["step"]) == 7
