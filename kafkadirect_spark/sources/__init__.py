from kafkadirect_spark.sources.batch import TABLES, load_all, load_table, register_views

__all__ = ["TABLES", "load_table", "load_all", "register_views"]
