from kspp_spark.streaming.stateful import rate_limit_batch, rate_limit_stream, delay_stream

__all__ = ["rate_limit_batch", "rate_limit_stream", "delay_stream"]
