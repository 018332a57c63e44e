from .metrics import (
    compute_exact_match, compute_bleu, compute_rouge, compute_metrics,
    bert_score_from_embeddings,
)
