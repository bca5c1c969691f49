from .retrieval_metrics import chain_metrics, aggregate_metrics
from .hotpot_metrics import (
    normalize_answer,
    f1_score,
    exact_match_score,
    update_answer,
    update_sp,
)

__all__ = [
    "chain_metrics",
    "aggregate_metrics",
    "normalize_answer",
    "f1_score",
    "exact_match_score",
    "update_answer",
    "update_sp",
]
