"""Driver contract for the swarm-spark engine.

``entry`` runs the flagship query at sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
(declared queries of §2.3 plus the LLM-data-pipeline operators) for the
driver's DuckDB hash-check at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: routed-ingest pricing summary (G1 grouping shape) —
    lineitem scanned once, grouped by destination-like keys with exact
    aggregates."""
    from swarm_spark.sources.tables import load_table

    li = load_table(spark, SMOKE_SF_DIR, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
            F.ceil(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0)
            .cast("long")
            .alias("price_ceil"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from swarm_spark.queries import all_queries

    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from swarm_spark.queries import all_queries

    return {name: sql for name, (_fn, sql) in all_queries().items() if sql is not None}
