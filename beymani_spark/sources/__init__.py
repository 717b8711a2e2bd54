from .tables import TABLES, load_table, get_spark

__all__ = ["TABLES", "load_table", "get_spark"]
