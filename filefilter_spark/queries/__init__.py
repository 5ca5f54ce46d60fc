from filefilter_spark.queries.registry import REGISTRY, QuerySpec, load_table, register_views

__all__ = ["REGISTRY", "QuerySpec", "load_table", "register_views"]
