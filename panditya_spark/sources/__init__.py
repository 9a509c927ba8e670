from panditya_spark.sources.loaders import TESTDATA_TABLES, load_table, load_tables

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables"]
