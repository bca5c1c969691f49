from .encoder import TransformerEncoder, roberta_position_ids
from .retriever import (
    MhopRetriever,
    SingleRetriever,
    UnifiedRetriever,
    CtxEncoder,
    ProjectionHead,
)

__all__ = [
    "TransformerEncoder",
    "roberta_position_ids",
    "MhopRetriever",
    "SingleRetriever",
    "UnifiedRetriever",
    "CtxEncoder",
    "ProjectionHead",
]
