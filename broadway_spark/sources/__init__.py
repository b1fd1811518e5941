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
- ``SQSSource``: delete-family connector (ack = per-message DELETE,
  redelivery via visibility timeout, retry via
  ChangeMessageVisibility(0)), against a file-backed queue double
  with real visibility semantics.
- ``PubSubSource``: ack-deadline-family connector (ack = ack_id before
  a renewable deadline lease, nack = modifyAckDeadline(0), redelivery
  via lease expiry), against a file-backed subscription double.

The reference's four official connector families map onto three ack
styles, all carried here: Kafka → offset commit; SQS → delete-as-ack
with visibility timeout; Google Pub/Sub → ack-deadline lease with
renewal. RabbitMQ's channel nack/requeue is the Pub/Sub nack shape
with a channel-scoped handle — a production Rabbit connector reuses
the PubSub-shaped surface (pull / bulk-ack executor / nack-requeue)
with a different client in the broker seam.
"""

from broadway_spark.sources.file_stream import FileStreamSource
from broadway_spark.sources.pubsub import PubSubSource, register_pubsub_source
from broadway_spark.sources.spool import SpoolSource, register_spool_source
from broadway_spark.sources.sqs import SQSSource, register_sqs_source

__all__ = [
    "FileStreamSource",
    "PubSubSource",
    "SpoolSource",
    "SQSSource",
    "register_pubsub_source",
    "register_spool_source",
    "register_sqs_source",
]
