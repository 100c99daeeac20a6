from . import dedup, similarity, text, timeseries

__all__ = ["dedup", "similarity", "text", "timeseries"]
