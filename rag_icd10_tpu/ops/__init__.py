from .flat_topk import (
    weighted_scores_reference,
    topk_reference,
    flat_search_jax,
    pad_corpus,
)
from .pallas_score import fused_weighted_scores
from .rerank import bf16_rerank_search, bf16_scan_bound

__all__ = [
    "weighted_scores_reference",
    "topk_reference",
    "flat_search_jax",
    "pad_corpus",
    "fused_weighted_scores",
    "bf16_rerank_search",
    "bf16_scan_bound",
]
