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
    session_window_count,
    count_by_value,
    ktable,
    windowed_count,
    windowed_sum,
)
from kspp_spark.operators.joins import (
    asof_join,
    kstream_inner_join,
    kstream_left_join,
    ktable_inner_join,
    ktable_left_join,
    ktable_outer_join,
)
from kspp_spark.operators.skew import (
    salted_count,
    salted_join,
    salted_sum,
    with_salt,
)

__all__ = [
    "filter_",
    "flat_map",
    "merge",
    "repartition_by_foreign_key",
    "transform",
    "transform_value",
    "count_by_key",
    "session_window_count",
    "count_by_value",
    "ktable",
    "windowed_count",
    "windowed_sum",
    "asof_join",
    "kstream_inner_join",
    "kstream_left_join",
    "ktable_inner_join",
    "ktable_left_join",
    "ktable_outer_join",
    "salted_count",
    "salted_join",
    "salted_sum",
    "with_salt",
]
