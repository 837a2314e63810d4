from .platform import pallas_ok
from .tree import byte_size, dtype_census, param_count, summarize

__all__ = [
    "byte_size", "dtype_census", "pallas_ok", "param_count", "summarize",
]
