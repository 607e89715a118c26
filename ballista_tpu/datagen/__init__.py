from .tpch import TPCH_TABLES, generate_table, generate_tpch, register_tpch
