"""Strict, monotonic schema merge (operators Q2/Q3).

Reference semantics (pinned by /root/reference/pkg/usecase/migrate_test.go:77-132
via the bqs library, applied at pkg/usecase/bigquery.go:26,55):

- merge = recursive field union;
- existing fields keep their position, new fields are appended in the
  order they appear in the incoming schema;
- same field name with a different type → hard error (NO coercion —
  Spark's parquet ``mergeSchema`` would silently widen, so this is
  custom);
- arrays merge element-wise (REPEATED mode in BQ terms): array<struct>
  merges the element structs recursively, array type vs scalar type of
  the same name → error.

Nullability is not part of the merge identity: evolving tables always
hold nullable fields (a record lacking a column reads as null), matching
BigQuery's NULLABLE default mode.
"""

from __future__ import annotations

from pyspark.sql import types as T


class SchemaConflictError(TypeError):
    """Same field name inferred with incompatible types."""

    def __init__(self, path: str, old: T.DataType, new: T.DataType):
        self.path, self.old, self.new = path, old, new
        super().__init__(
            f"schema conflict at {path!r}: {old.simpleString()} vs {new.simpleString()}"
        )


def merge_schemas(old: T.StructType, new: T.StructType, _path: str = "") -> T.StructType:
    """Union ``new`` into ``old``: stable order, append-new, strict types."""
    by_name = {f.name: f for f in old.fields}
    out: list[T.StructField] = []
    for f in old.fields:
        nf = _field_by_name(new, f.name)
        if nf is None:
            out.append(_nullable(f))
        else:
            merged = _merge_types(f.dataType, nf.dataType, f"{_path}{f.name}")
            out.append(T.StructField(f.name, merged, True))
    for f in new.fields:
        if f.name not in by_name:
            out.append(_nullable(f))
    return T.StructType(out)


def _field_by_name(s: T.StructType, name: str) -> T.StructField | None:
    for f in s.fields:
        if f.name == name:
            return f
    return None


def _nullable(f: T.StructField) -> T.StructField:
    return T.StructField(f.name, _nullable_type(f.dataType), True)


def _nullable_type(dt: T.DataType) -> T.DataType:
    if isinstance(dt, T.StructType):
        return T.StructType([_nullable(f) for f in dt.fields])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable_type(dt.elementType), True)
    return dt


def _merge_types(old: T.DataType, new: T.DataType, path: str) -> T.DataType:
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        return merge_schemas(old, new, _path=path + ".")
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return T.ArrayType(_merge_types(old.elementType, new.elementType, path + "[]"), True)
    if type(old) is type(new):
        if old == new or old.simpleString() == new.simpleString():
            return _nullable_type(old)
        # same class, different parametrization (e.g. decimals)
        raise SchemaConflictError(path, old, new)
    raise SchemaConflictError(path, old, new)


def schemas_equal(a: T.StructType, b: T.StructType) -> bool:
    """Q3 no-op detection: equality after nullability normalization."""
    return _nullable_type(a) == _nullable_type(b)
