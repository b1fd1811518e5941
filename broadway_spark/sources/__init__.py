"""Sources — producers in Broadway terms.

- ``FileStreamSource``: watched-directory file source (parquet/json) —
  the workhorse; back-pressure via maxFilesPerTrigger.
- ``SpoolSource`` (+ ``register_spool_source``): a custom Python
  ``DataSourceStreamReader`` over a JSON-lines spool directory with
  driver-side admission control — the rate-limiter / push_messages /
  commit-ack testbed, mirroring the reference's producer stage.
- ``KafkaSource``: offset-family connector (ack = checkpointed offset
  commit); ``fmt='fake_kafka'`` drives the identical projection
  against a file-backed broker honoring the Kafka record schema.
- ``SQSSource``: lease-family connector (ack = per-message DELETE,
  redelivery via visibility timeout, retry via
  ChangeMessageVisibility(0)), against a file-backed queue double
  with real visibility semantics.

The reference's four official connectors map onto these two ack
families: Kafka → offset family; SQS, Google Pub/Sub (ack deadline ≈
visibility timeout, modifyAckDeadline ≈ ChangeMessageVisibility) and
RabbitMQ (nack-requeue ≈ retry visibility reset) → lease family. A
production Pub/Sub or Rabbit connector reuses the SQS-shaped surface
(receive / bulk-ack executor / redelivery contract) with a different
client in the broker seam.
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
