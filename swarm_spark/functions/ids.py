"""Deterministic row IDs (operator T2).

Reference: when a schema rule emits no ``id``, the row id is
``md5(json.Marshal(data))`` (/root/reference/pkg/usecase/load.go:225-231,
pkg/domain/types/types.go:27-34). Go's ``json.Marshal``:

- sorts map keys (byte order — equals code-point order for UTF-8);
- compact separators;
- HTML-escapes ``< > &`` as ``\\u003c \\u003e \\u0026`` and U+2028/2029;
- formats float64 with shortest round-trip digits, ``f`` style for
  1e-6 ≤ |x| < 1e21 (so ``3.0`` marshals as ``"3"``), ``e`` style
  outside with ``e-07`` collapsed to ``e-7``.

:func:`canonical_json` reproduces that byte-for-byte for decoded-JSON
values; :func:`log_id` is the md5 hex digest. Idempotency is pinned by
the reference's TestNewLogIDIdempotent (pkg/domain/types/types_test.go).

Spark side, two tiers:
- :func:`fast_id_column` — pure JVM: ``md5(to_json(sort_fields(data)))``.
  Whole-stage-codegen'd, the 100-TB path. Matches :func:`log_id` when
  leaf values are strings/longs/booleans (the common log case); doubles
  format Spark-style (``3.0``) not Go-style (``3``).
- :func:`canonical_id_column` — Arrow-batched pandas UDF that re-canonicalizes
  the JSON driver-side for exact Go parity. Use only where cross-engine
  hash equality with the reference is required.
"""

from __future__ import annotations

import hashlib
import json
import math
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def go_format_float(f: float) -> str:
    """Shortest-round-trip float formatting, Go encoding/json rules."""
    if math.isnan(f) or math.isinf(f):
        raise ValueError(f"json: unsupported value: {f}")
    # shortest digits via Python repr (both use Ryū/Grisu-shortest)
    s = repr(f)
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if "e" in s:
        mant, _, exps = s.partition("e")
        exp = int(exps)
    else:
        mant, exp = s, 0
    intp, _, frac = mant.partition(".")
    raw = (intp + frac).lstrip("0")
    e10 = exp - len(frac)
    if not raw:
        return "-0" if neg else "0"
    digits = raw.rstrip("0")
    e10 += len(raw) - len(digits)
    k = len(digits) - 1 + e10  # scientific exponent
    absf = abs(f)
    if absf != 0 and (absf < 1e-6 or absf >= 1e21):
        m = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        es = f"{abs(k):02d}"
        if k < 0 and es.startswith("0") and len(es) == 2:
            es = es[1]  # Go collapses e-07 → e-7
        out = f"{m}e{'+' if k >= 0 else '-'}{es}"
    else:
        if e10 >= 0:
            out = digits + "0" * e10
        elif len(digits) + e10 > 0:
            out = digits[: len(digits) + e10] + "." + digits[len(digits) + e10 :]
        else:
            out = "0." + "0" * -(len(digits) + e10) + digits
    return "-" + out if neg else out


def _enc_str(s: str) -> str:
    out = json.dumps(s, ensure_ascii=False)
    return (
        out.replace("<", "\\u003c")
        .replace(">", "\\u003e")
        .replace("&", "\\u0026")
        .replace(chr(0x2028), "\\u2028")
        .replace(chr(0x2029), "\\u2029")
    )


def _enc(v: Any, out: list[str]) -> None:
    if v is None:
        out.append("null")
    elif v is True:
        out.append("true")
    elif v is False:
        out.append("false")
    elif isinstance(v, float):
        out.append(go_format_float(v))
    elif isinstance(v, int):
        out.append(str(v))
    elif isinstance(v, str):
        out.append(_enc_str(v))
    elif isinstance(v, dict):
        out.append("{")
        for i, k in enumerate(sorted(v.keys())):
            if i:
                out.append(",")
            out.append(_enc_str(str(k)))
            out.append(":")
            _enc(v[k], out)
        out.append("}")
    elif isinstance(v, (list, tuple)):
        out.append("[")
        for i, x in enumerate(v):
            if i:
                out.append(",")
            _enc(x, out)
        out.append("]")
    else:
        raise TypeError(f"json: unsupported type: {type(v).__name__}")


def canonical_json(value: Any) -> str:
    """Go ``json.Marshal`` parity encoding of a decoded-JSON value."""
    out: list[str] = []
    _enc(value, out)
    return "".join(out)


def log_id(data: Any) -> str:
    """md5 hex of the canonical JSON — the reference's NewLogID."""
    return hashlib.md5(canonical_json(data).encode("utf-8")).hexdigest()


def sort_struct_fields(col: Column, dtype: T.DataType) -> Column:
    """Rebuild a (nested) struct column with fields in sorted-name order.

    Required before ``to_json`` so the serialized key order matches the
    canonical (sorted) order Go produces.
    """
    if isinstance(dtype, T.StructType):
        inner = [
            sort_struct_fields(col.getField(f.name), f.dataType).alias(f.name)
            for f in sorted(dtype.fields, key=lambda f: f.name)
        ]
        return F.when(col.isNull(), F.lit(None).cast(_sorted_type(dtype))).otherwise(
            F.struct(*inner)
        )
    if isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType, (T.StructType, T.ArrayType)
    ):
        return F.transform(col, lambda x: sort_struct_fields(x, dtype.elementType))
    return col


def _sorted_type(dt: T.DataType) -> T.DataType:
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _sorted_type(f.dataType), True)
                for f in sorted(dt.fields, key=lambda f: f.name)
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_sorted_type(dt.elementType), True)
    return dt


def fast_id_column(data_col: str | Column, dtype: T.DataType) -> Column:
    """JVM-only content hash: md5 of sorted-field compact to_json."""
    col = F.col(data_col) if isinstance(data_col, str) else data_col
    return F.md5(F.to_json(sort_struct_fields(col, dtype)))


def _canonical_md5_from_json_fn(s: pd.Series) -> pd.Series:
    def one(x):
        if x is None:
            return None
        return hashlib.md5(canonical_json(json.loads(x)).encode("utf-8")).hexdigest()

    return s.map(one)


_canonical_udf = None


def canonical_id_column(data_col: str | Column, dtype: T.DataType) -> Column:
    """Go-parity content hash (Arrow-batched; slow path, exact bytes).

    Doubles round-trip through JSON text, so Spark's ``3.0`` re-formats
    to Go's ``3`` before hashing.
    """
    global _canonical_udf
    if _canonical_udf is None:
        _canonical_udf = F.pandas_udf(_canonical_md5_from_json_fn, T.StringType())
    col = F.col(data_col) if isinstance(data_col, str) else data_col
    return _canonical_udf(F.to_json(sort_struct_fields(col, dtype)))
