from etl_geonames_spark.plans.inspect import (
    count_nodes,
    explain_str,
    global_windows,
    has_broadcast_hash_join,
    has_node,
    pushed_filters,
    read_schema_columns,
    shuffle_exchange_count,
    wholestage_codegen_count,
)

__all__ = [
    "count_nodes",
    "explain_str",
    "global_windows",
    "has_broadcast_hash_join",
    "has_node",
    "pushed_filters",
    "read_schema_columns",
    "shuffle_exchange_count",
    "wholestage_codegen_count",
]
