from kspp_spark.streaming.core import dedup_stream
from kspp_spark.streaming.stateful import rate_limit_batch, rate_limit_stream, delay_stream

__all__ = ["dedup_stream", "rate_limit_batch", "rate_limit_stream", "delay_stream"]
