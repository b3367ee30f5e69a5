from .search import FlatIPIndex, build_index, search_index

__all__ = ["FlatIPIndex", "build_index", "search_index"]
