from mapreducewordcount_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_hash_join,
    has_pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)
