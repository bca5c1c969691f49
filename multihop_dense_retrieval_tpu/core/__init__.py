from .config import (
    EncoderConfig,
    RetrieverTrainConfig,
    SearchConfig,
    ReaderConfig,
)
from .mesh import make_mesh, local_device_count

__all__ = [
    "EncoderConfig",
    "RetrieverTrainConfig",
    "SearchConfig",
    "ReaderConfig",
    "make_mesh",
    "local_device_count",
]
