from .encoder import TransformerEncoder, roberta_position_ids
from .retriever import (
    MhopRetriever,
    SingleRetriever,
    UnifiedRetriever,
    NQRetriever,
    MultiVectorCtxEncoder,
    CtxEncoder,
    ProjectionHead,
)
from .reader import QAReader

__all__ = [
    "TransformerEncoder",
    "roberta_position_ids",
    "MhopRetriever",
    "SingleRetriever",
    "UnifiedRetriever",
    "NQRetriever",
    "MultiVectorCtxEncoder",
    "CtxEncoder",
    "ProjectionHead",
    "QAReader",
]
