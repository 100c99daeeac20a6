from .oracles import ORACLES, all_oracles
from .queries import QUERIES, all_queries

__all__ = ["QUERIES", "ORACLES", "all_queries", "all_oracles"]
