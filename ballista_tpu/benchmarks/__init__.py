from .queries import TPCH_QUERIES
