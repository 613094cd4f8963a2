"""Full-scan schema inference (operator Q1) + alignment helpers.

The reference infers a schema from EVERY record in a destination batch
and folds them with a strict merge (/root/reference/pkg/usecase/
bigquery.go:47-62) — explicitly not a sample (docs/comparisons.md).

On Spark, inference falls out of the typed read: ``spark.read.json``
already unions over all rows (sampling is configurable; we pin full
scan), so a batch arrives as a typed ``data`` struct. What remains is:

- :func:`infer_record_schema` — infer a StructType from one decoded
  Python record (bqs.Infer analogue), for the driver-side paths and
  parity tests. JSON-sourced numbers are integral→Long, fractional→
  Double, matching Spark's own JSON inference.
- :func:`align_to_schema` — cast/project a DataFrame onto a (merged)
  target StructType, adding missing fields as typed nulls, preserving
  target field order. This is how an append conforms to the evolved
  table schema.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .merge import SchemaConflictError, merge_schemas


def infer_value_type(value: Any, path: str = "") -> T.DataType | None:
    """Infer the Spark type of one decoded-JSON value; None if untyped."""
    if value is None:
        return None
    if isinstance(value, bool):  # before int: bool is an int subclass
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, dict):
        fields = []
        for k, v in value.items():
            dt = infer_value_type(v, f"{path}{k}.")
            if dt is not None:
                fields.append(T.StructField(k, dt, True))
        return T.StructType(fields) if fields else None
    if isinstance(value, (list, tuple)):
        elem: T.DataType | None = None
        for v in value:
            dt = infer_value_type(v, path + "[].")
            if dt is None:
                continue
            if elem is None:
                elem = dt
            elif isinstance(elem, T.StructType) and isinstance(dt, T.StructType):
                elem = merge_schemas(elem, dt)
            elif elem != dt:
                if {type(elem), type(dt)} == {T.LongType, T.DoubleType}:
                    elem = T.DoubleType()  # JSON numbers widen within an array
                else:
                    raise SchemaConflictError(path + "[]", elem, dt)
        return T.ArrayType(elem, True) if elem is not None else None
    raise TypeError(f"cannot infer type at {path!r} for {type(value).__name__}")


def infer_record_schema(record: dict) -> T.StructType:
    """bqs.Infer analogue for one (already null-stripped) record."""
    dt = infer_value_type(record)
    if dt is None:
        return T.StructType([])
    if not isinstance(dt, T.StructType):
        raise TypeError("top-level record must be a JSON object")
    return dt


def infer_batch_schema(records: list[dict]) -> T.StructType:
    """Infer each record then strict-merge — the reference's Q1∘Q2 fold."""
    out = T.StructType([])
    for r in records:
        out = merge_schemas(out, infer_record_schema(r))
    return out


def _align_expr(col: Column, src: T.DataType | None, dst: T.DataType) -> Column:
    if src is None:
        return F.lit(None).cast(dst)
    if isinstance(dst, T.StructType):
        if not isinstance(src, T.StructType):
            raise SchemaConflictError("<align>", src, dst)
        inner = [
            _align_expr(
                col.getField(f.name) if _has_field(src, f.name) else F.lit(None),
                _field_type(src, f.name),
                f.dataType,
            ).alias(f.name)
            for f in dst.fields
        ]
        # preserve row-level nulls: a null struct stays null, not struct(nulls)
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(F.struct(*inner))
    if isinstance(dst, T.ArrayType):
        if not isinstance(src, T.ArrayType):
            raise SchemaConflictError("<align>", src, dst)
        if src.elementType == dst.elementType:
            return col
        return F.transform(col, lambda x: _align_expr(x, src.elementType, dst.elementType))
    if src == dst:
        return col
    return col.cast(dst)


def _has_field(s: T.DataType | None, name: str) -> bool:
    return isinstance(s, T.StructType) and any(f.name == name for f in s.fields)


def _field_type(s: T.DataType | None, name: str) -> T.DataType | None:
    if not isinstance(s, T.StructType):
        return None
    for f in s.fields:
        if f.name == name:
            return f.dataType
    return None


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: order, add null columns, recurse."""
    cols = [
        _align_expr(
            F.col(f.name) if _has_field(df.schema, f.name) else F.lit(None),
            _field_type(df.schema, f.name),
            f.dataType,
        ).alias(f.name)
        for f in target.fields
    ]
    return df.select(*cols)
