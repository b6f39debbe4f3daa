from kspp_spark.streaming.core import (
    count_by_key_stream,
    count_by_value_stream,
    dedup_stream,
    ktable_stream,
    stream_stream_join,
    windowed_count_stream,
    with_watermark,
)
from kspp_spark.streaming.dedup_incremental import (
    banded_signatures,
    incremental_near_dedup,
)
from kspp_spark.streaming.stateful import (
    delay_stream,
    rate_limit_batch,
    rate_limit_stream,
    windowed_table_stream,
)

__all__ = [
    "count_by_key_stream",
    "count_by_value_stream",
    "dedup_stream",
    "ktable_stream",
    "stream_stream_join",
    "windowed_count_stream",
    "with_watermark",
    "banded_signatures",
    "incremental_near_dedup",
    "delay_stream",
    "rate_limit_batch",
    "rate_limit_stream",
    "windowed_table_stream",
]
