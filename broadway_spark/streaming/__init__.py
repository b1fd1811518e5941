"""Streaming execution: the foreachBatch router / ack executor and
supporting pieces for the compiled pipeline."""

from broadway_spark.streaming.router import build_router

__all__ = ["build_router"]
