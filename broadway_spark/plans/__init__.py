"""Plan layer: compile a TopologyConfig + source into a Structured
Streaming query (the analogue of the reference's topology builder,
``lib/broadway/topology.ex``)."""

from broadway_spark.plans.topology import (
    Pipeline,
    all_running,
    producer_names,
)

__all__ = ["Pipeline", "all_running", "producer_names"]
