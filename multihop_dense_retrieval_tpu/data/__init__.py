from .tokenization import HashTokenizer, HFTokenizer, TokenizerSpec
from .mhop_dataset import MhopDataset, mhop_collate
from .corpus import Corpus, TokenizedCorpus
from .loader import BatchLoader

__all__ = [
    "HashTokenizer",
    "HFTokenizer",
    "TokenizerSpec",
    "MhopDataset",
    "mhop_collate",
    "Corpus",
    "TokenizedCorpus",
    "BatchLoader",
]
