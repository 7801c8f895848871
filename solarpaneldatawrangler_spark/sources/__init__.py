from solarpaneldatawrangler_spark.sources.star import STAR_TABLES, load_table, register_views

__all__ = ["STAR_TABLES", "load_table", "register_views"]
