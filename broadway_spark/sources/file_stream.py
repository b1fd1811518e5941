"""File-stream source: a watched directory of parquet/json files.

The standard high-volume producer (S1 in SURVEY §2.1). Demand-driven
back-pressure maps to ``maxFilesPerTrigger`` (reference: GenStage
demand, ``options.ex:168-181``); "push_messages" (S2) is literally
dropping a new file into the directory.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class FileStreamSource:
    name: str
    path: str
    schema_ddl: str  # DDL string or a StructType (both accepted by .schema)
    format: str = "parquet"
    ack_data_column: str = "event_id"
    max_files_per_trigger: int | None = None
    # extra reader options (e.g. pathGlobFilter to watch one file of a
    # mixed directory)
    options: dict | None = None

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format(self.format).schema(self.schema_ddl)
        if self.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        for k, v in (self.options or {}).items():
            reader = reader.option(k, v)
        return reader.load(self.path)

    def read_batch(self, spark: SparkSession) -> DataFrame:
        """Batch-mode twin — used for streaming/batch equivalence tests
        (SURVEY §5: every streaming result must equal its batch run)."""
        reader = spark.read.format(self.format).schema(self.schema_ddl)
        for k, v in (self.options or {}).items():
            reader = reader.option(k, v)
        return reader.load(self.path)
