"""JSON object source (operators S1/P1/D1).

Reference semantics: one object = a byte stream holding NDJSON, a
single JSON document, or *concatenated* JSON documents, optionally
gzipped; a ``json.Decoder`` loop yields one record per top-level value
(/root/reference/pkg/usecase/load.go:251-279).

Spark-first mapping:

- ``lines`` mode — NDJSON (+ transparent ``.gz``): plain
  ``spark.read.json(paths)``. This is the 100-TB path: splittable for
  plain text, parallel-per-file for gzip, predicate/column pruning and
  full-scan schema inference all JVM-side.
- ``whole`` mode — single-doc or concatenated JSON: files are read
  with ``wholetext`` and split into top-level values with a streaming
  decoder inside ``mapInPandas`` (ONE Python pass per file, Arrow
  batches out), then parsed + inferred by the JVM json reader over the
  value column as a ``Dataset[String]`` — the strings never cross back
  into Python. Only use for formats NDJSON can't express; per-file
  parallelism still applies.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _split_concatenated(text: str) -> list[str]:
    """Split concatenated/whitespace-separated top-level JSON values."""
    dec = json.JSONDecoder()
    out = []
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i] in " \t\r\n":
            i += 1
        if i >= n:
            break
        _, end = dec.raw_decode(text, i)
        out.append(text[i:end])
        i = end
    return out


def _make_explode_values():
    """Build the per-file splitter as a NESTED function: cloudpickle
    ships nested functions by value (module-level ones go by reference,
    which breaks on workers without swarm_spark on their path)."""

    def explode_values(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        import pandas as _pd

        dec = _json.JSONDecoder()

        def split(text: str) -> list[str]:
            out, i, n = [], 0, len(text)
            while i < n:
                while i < n and text[i] in " \t\r\n":
                    i += 1
                if i >= n:
                    break
                _, end = dec.raw_decode(text, i)
                out.append(text[i:end])
                i = end
            return out

        for pdf in it:
            for txt in pdf["value"]:
                vals = split(txt)
                if vals:
                    yield _pd.DataFrame({"value": vals})

    return explode_values


def read_objects(
    spark: SparkSession,
    paths: list[str],
    parser: str = "json",
    mode: str = "lines",
) -> DataFrame:
    """Format dispatcher for object reads (P1 + engine extensions).

    json → :func:`read_json_objects`; csv → header + full-scan
    inference; parquet/orc → native typed columnar reads. All paths
    decompress ``.gz`` transparently where the format supports it.
    """
    if parser == "json":
        return read_json_objects(spark, paths, mode=mode)
    if parser == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(paths)
    if parser == "parquet":
        return spark.read.parquet(*paths)
    if parser == "orc":
        return spark.read.orc(*paths)
    raise ValueError(f"unknown parser: {parser!r}")


def read_json_objects(
    spark: SparkSession,
    paths: list[str],
    mode: str = "lines",
) -> DataFrame:
    """Read JSON objects into a typed DataFrame (full-scan inference).

    NDJSON documents whose top-level value is an array are exploded by
    ``spark.read.json`` itself; ``whole`` mode yields one row per
    top-level JSON value per file, matching the reference's decoder
    loop.
    """
    # dropFieldIfAllNull: all-null / always-empty fields carry no type —
    # the inference half of the reference's null-strip (T1, SURVEY §2)
    if mode == "lines":
        return (
            spark.read.option("multiLine", "false")
            .option("dropFieldIfAllNull", "true")
            .json(paths)
        )
    if mode == "whole":
        texts = spark.read.text(paths, wholetext=True)
        values = texts.mapInPandas(_make_explode_values(), schema="value string")
        reader = (
            spark.read.option("multiLine", "false")
            .option("dropFieldIfAllNull", "true")
        )
        try:
            # JVM-side parse + inference over the value strings as a
            # Dataset[String]: the split pass is the ONLY Python hop.
            jds = getattr(values._jdf, "as")(
                spark._jvm.org.apache.spark.sql.Encoders.STRING()
            )
            return DataFrame(reader._jreader.json(jds), spark)
        except Exception:
            # non-classic sessions (e.g. Connect) lack the py4j bridge;
            # fall back to the documented RDD[str] inference path
            return reader.json(values.rdd.map(lambda r: r.value))
    raise ValueError(f"unknown json read mode: {mode!r}")
