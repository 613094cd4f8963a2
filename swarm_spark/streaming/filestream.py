"""Structured Streaming ingest (the §3.1 serve path on Spark's own
streaming runtime).

``stream_ingest`` watches a directory as a file-notification-style
source and lands every microbatch through the SAME rule/envelope/
routed-write path as batch ingest, via ``foreachBatch`` — the pattern
the reference's Pub/Sub-push microbatching maps onto (one push = one
microbatch of files). Checkpointing gives at-least-once delivery;
content-hash ids (T2) + the state ledger (X1) supply the effective
exactly-once the reference gets from Firestore.

Late data: the reference appends every record regardless of event time
(no watermarks — SURVEY §2.2), so the default here is the same;
windowed/watermarked aggregation is available on the destination
tables through plain Spark once landed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..pipeline.ingest import IngestPipeline


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    record_schema: T.StructType,
    pipeline: IngestPipeline,
    schema_name: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start a streaming query ingesting JSON files from ``input_dir``.

    ``available_now=True`` drains everything currently present and
    stops (backfill/test mode); ``False`` runs continuously. The
    record schema must be provided — streaming sources cannot infer
    (full-scan inference remains the batch path's job; a schema-apply
    run produces the schema to pin here).
    """
    reader = spark.readStream.schema(record_schema).option("multiLine", "false")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(input_dir)

    def land(batch_df, epoch_id: int) -> None:
        pipeline.ingest_frame(batch_df, schema_name)

    writer = stream.writeStream.foreachBatch(land).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
