from .compile_cache import enable_compile_cache
from .config import (
    EncoderConfig,
    RetrieverTrainConfig,
    SearchConfig,
    ReaderConfig,
)
from .mesh import make_mesh, local_device_count

__all__ = [
    "enable_compile_cache",
    "EncoderConfig",
    "RetrieverTrainConfig",
    "SearchConfig",
    "ReaderConfig",
    "make_mesh",
    "local_device_count",
]
