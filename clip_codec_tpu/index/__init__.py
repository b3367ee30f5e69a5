from .ivf import IVFIndex, build_ivf_index, kmeans
from .search import (
    FlatIPIndex,
    ShardedFlatIPIndex,
    build_index,
    build_sharded_index,
    search_index,
)

__all__ = [
    "FlatIPIndex", "build_index", "search_index",
    "ShardedFlatIPIndex", "build_sharded_index",
    "IVFIndex", "build_ivf_index", "kmeans",
]
