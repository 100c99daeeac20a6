from .oracles import EXTRA_ORACLES, ORACLES, all_oracles, all_oracles_full
from .queries import DRIVER_WINDOW, QUERIES, all_queries

__all__ = [
    "QUERIES",
    "ORACLES",
    "EXTRA_ORACLES",
    "DRIVER_WINDOW",
    "all_queries",
    "all_oracles",
    "all_oracles_full",
]
