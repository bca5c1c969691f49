from .mips import (
    mips_topk_xla,
    mips_topk_pallas,
    mips_topk,
    mips_topk_pca,
    train_pca_rotation,
    build_pca_prefilter,
    sharded_mips_topk,
    sharded_mips_topk_pca,
)

__all__ = [
    "mips_topk_xla",
    "mips_topk_pallas",
    "mips_topk",
    "mips_topk_pca",
    "train_pca_rotation",
    "build_pca_prefilter",
    "sharded_mips_topk",
    "sharded_mips_topk_pca",
]
