from .mips import (
    mips_topk_xla,
    mips_topk_pallas,
    mips_topk,
    sharded_mips_topk,
)

__all__ = [
    "mips_topk_xla",
    "mips_topk_pallas",
    "mips_topk",
    "sharded_mips_topk",
]
