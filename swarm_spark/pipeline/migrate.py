"""SQL pass-through migrate + schema-only apply (operators M1, Q1-Q4).

Reference ``migrate`` (/root/reference/pkg/usecase/migrate.go:14-73):
ensure the destination table exists with the source's (optionally
merged) schema and partitioning, then run a user SQL — default
``INSERT INTO dst SELECT * FROM src``. Spark SQL supersedes the
BigQuery pass-through: any registered table is queryable.

``apply_schema`` is the ``swarm schema`` command
(pkg/usecase/schema.go:13-90): run routing + transform + inference and
evolve destination schemas WITHOUT inserting rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model import ModelError, ObjectMeta, TableDest
from ..pipeline.ingest import IngestPipeline
from ..schema.strip import strip_struct_column
from ..sinks.table import TableSink


def migrate(
    spark: SparkSession,
    sink: TableSink,
    src: TableDest,
    dst: TableDest,
    query: str | None = None,
) -> int:
    """Ensure dst (schema merged from src), then run the migration SQL.

    The query sees the source as view ``src`` and must produce rows in
    the destination's full row shape; default is ``SELECT * FROM src``.
    """
    src_df = sink.read_table(src)
    data_schema = src_df.schema["data"].dataType
    merged = sink.ensure_table(dst, data_schema)

    src_df.createOrReplaceTempView("src")
    out: DataFrame = spark.sql(query or "SELECT * FROM src")
    if set(out.columns) != set(src_df.columns):
        raise ModelError(
            f"migrate query must produce the row envelope {src_df.columns}, got {out.columns}"
        )
    from ..schema.infer import _align_expr  # align data struct to merged
    from pyspark.sql import functions as F

    aligned = out.select(
        "id",
        "ingest_id",
        "timestamp",
        "ingested_at",
        _align_expr(F.col("data"), out.schema["data"].dataType, merged).alias("data"),
    )
    return sink.append(dst, aligned)


def apply_schema(pipeline: IngestPipeline, objs: list[ObjectMeta]) -> list[TableDest]:
    """Evolve destination schemas from the objects' inferred shapes
    without writing any rows. Returns the destinations touched."""
    enveloped = pipeline.transform_objects(objs)
    if enveloped is None:
        return []
    from pyspark.sql import functions as F

    touched = []
    dests = [
        TableDest(r["dataset"], r["table"], r["partition"])
        for r in enveloped.select("dataset", "table", "partition").distinct().collect()
    ]
    for dest in sorted(dests, key=lambda d: (d.dataset, d.table, d.partition)):
        batch = enveloped.where(
            (F.col("dataset") == dest.dataset)
            & (F.col("table") == dest.table)
            & (F.col("partition") == dest.partition)
        ).select("data")
        batch = strip_struct_column(batch, "data")
        pipeline.sink.ensure_table(dest, batch.schema["data"].dataType)
        touched.append(dest)
    return touched
