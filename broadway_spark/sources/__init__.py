"""Sources — producers in Broadway terms.

- ``FileStreamSource``: watched-directory file source (parquet/json) —
  the workhorse; back-pressure via maxFilesPerTrigger.
- ``SpoolSource`` (+ ``register_spool_source``): a custom Python
  ``DataSourceStreamReader`` over a JSON-lines spool directory with
  driver-side admission control — the rate-limiter / push_messages /
  commit-ack testbed, mirroring the reference's producer stage.
"""

from broadway_spark.sources.file_stream import FileStreamSource
from broadway_spark.sources.spool import SpoolSource, register_spool_source
from broadway_spark.sources.sqs import SQSSource, register_sqs_source

__all__ = [
    "FileStreamSource",
    "SpoolSource",
    "SQSSource",
    "register_spool_source",
    "register_sqs_source",
]
