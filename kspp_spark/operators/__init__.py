from kspp_spark.operators.stateless import (
    filter_,
    flat_map,
    merge,
    repartition_by_foreign_key,
    transform,
    transform_value,
)
from kspp_spark.operators.aggregates import (
    count_by_key,
    count_by_value,
    ktable,
    windowed_count,
    windowed_sum,
)
from kspp_spark.operators.joins import (
    kstream_inner_join,
    kstream_left_join,
    ktable_inner_join,
    ktable_left_join,
    ktable_outer_join,
)

__all__ = [
    "filter_",
    "flat_map",
    "merge",
    "repartition_by_foreign_key",
    "transform",
    "transform_value",
    "count_by_key",
    "count_by_value",
    "ktable",
    "windowed_count",
    "windowed_sum",
    "kstream_inner_join",
    "kstream_left_join",
    "ktable_inner_join",
    "ktable_left_join",
    "ktable_outer_join",
]
