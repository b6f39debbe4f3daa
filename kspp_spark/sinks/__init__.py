from kspp_spark.sinks.writers import (
    dedupe_batch_for_upsert,
    foreach_batch_upsert,
    rotated_file_sink,
    console_sink,
    memory_sink,
    null_sink,
    kafka_sink,
)

__all__ = [
    "dedupe_batch_for_upsert",
    "foreach_batch_upsert",
    "rotated_file_sink",
    "console_sink",
    "memory_sink",
    "null_sink",
    "kafka_sink",
]
