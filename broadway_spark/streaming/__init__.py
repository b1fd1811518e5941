"""Streaming execution: the foreachBatch router / ack executor and
supporting pieces for the compiled pipeline."""

from broadway_spark.streaming.router import build_router
from broadway_spark.streaming.stateful_dedup import (
    streaming_exact_dedup,
    use_rocksdb_state,
)

__all__ = ["build_router", "streaming_exact_dedup", "use_rocksdb_state"]
