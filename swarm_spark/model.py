"""Core ingestion data model.

Re-expresses the reference's IR types (see SURVEY.md §1.1) as plain
dataclasses used driver-side; the record-level shapes live as DataFrame
schemas.

Reference parity (citations into /root/reference):
- Object         pkg/domain/model/usecase.go:30-48
- Source         pkg/domain/model/policy.go:25-52
- LoadRequest    pkg/domain/model/usecase.go:15-18
- Log/validate   pkg/domain/model/policy.go:54-89
- BigQueryDest   pkg/domain/model/policy.go:58-62
- LogRecord      pkg/domain/model/bigquery.go:98-105
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import types as T


class ParserType(str, Enum):
    # the reference supports only "json" (policy.go:32-52); csv/parquet
    # are engine extensions for mixed lakes
    JSON = "json"
    CSV = "csv"
    PARQUET = "parquet"
    ORC = "orc"


class CompressType(str, Enum):
    NONE = ""
    GZIP = "gzip"


class TimeUnit(str, Enum):
    """Destination-table time partitioning granularity.

    Mirrors reference pkg/domain/types/types.go:51-57; invalid units are
    rejected at metadata-build time (pkg/usecase/utils.go:189).
    """

    NONE = ""
    HOUR = "hour"
    DAY = "day"
    MONTH = "month"
    YEAR = "year"


VALID_TIME_UNITS = {u.value for u in TimeUnit}


class ModelError(ValueError):
    """Validation failure in the ingestion IR."""


@dataclass(frozen=True)
class Digest:
    alg: str
    value: str


@dataclass(frozen=True)
class ObjectRef:
    """Cloud-storage coordinates of one ingestion object."""

    bucket: str
    name: str

    @property
    def url(self) -> str:
        return f"gs://{self.bucket}/{self.name}"


@dataclass(frozen=True)
class ObjectMeta:
    """One ingestion unit: object coordinates + notification metadata.

    Event rules (R1) evaluate over this — metadata only, before any byte
    of the object is read (early routing filter, SURVEY.md §4).
    """

    bucket: str
    name: str
    size: int = 0
    created_at: int = 0  # unix seconds
    digests: tuple[Digest, ...] = ()
    data: dict | None = None  # raw notification payload, if any
    path: str | None = None  # local/posix path override (tests, dumps)

    @property
    def url(self) -> str:
        return self.path if self.path is not None else f"gs://{self.bucket}/{self.name}"


@dataclass(frozen=True)
class Source:
    """Parse directive produced by an event rule for one object."""

    parser: str = ParserType.JSON.value
    schema: str = ""
    compress: str = CompressType.NONE.value

    def validate(self) -> None:
        # reference: pkg/domain/model/policy.go:32-52
        if self.parser not in {p.value for p in ParserType}:
            raise ModelError(f"unsupported parser: {self.parser!r}")
        if self.compress not in {c.value for c in CompressType}:
            raise ModelError(f"unsupported compress: {self.compress!r}")
        if not self.schema:
            raise ModelError("source.schema (schema-rule name) is required")


@dataclass(frozen=True)
class LoadRequest:
    """One unit of load work: an object plus how to parse it."""

    obj: ObjectMeta
    source: Source


@dataclass(frozen=True)
class TableDest:
    """Routing key: destination table + partitioning granularity.

    The reference calls this BigQueryDest; here the physical table may be
    a local evolving-parquet table, a Delta table, or BigQuery.
    """

    dataset: str
    table: str
    partition: str = TimeUnit.NONE.value

    def validate(self) -> None:
        if not self.dataset:
            raise ModelError("dest.dataset required")
        if not self.table:
            raise ModelError("dest.table required")
        if self.partition not in VALID_TIME_UNITS:
            raise ModelError(f"invalid partition unit: {self.partition!r}")


def parse_object_url(url: str) -> ObjectRef:
    """Parse ``gs://bucket/object/name`` into an ObjectRef.

    Reference CSUrl.Parse semantics (pkg/domain/types/types.go:81-105,
    pinned by types_test.go TestCSUrl_Parse): scheme must be gs,
    bucket and a non-empty object path are required.
    """
    prefix = "gs://"
    if not url.startswith(prefix):
        raise ModelError(f"object URL must start with gs://: {url!r}")
    rest = url[len(prefix) :]
    bucket, sep, name = rest.partition("/")
    if not bucket or not sep or not name:
        raise ModelError(f"object URL needs bucket and object name: {url!r}")
    return ObjectRef(bucket=bucket, name=name)


# Fixed outer envelope written to every destination table
# (reference pkg/domain/model/bigquery.go:98-105). `data` is the evolving
# inferred struct and is appended per-destination.
ENVELOPE_FIELDS = [
    T.StructField("id", T.StringType(), True),
    T.StructField("ingest_id", T.StringType(), True),
    T.StructField("timestamp", T.TimestampType(), True),
    T.StructField("ingested_at", T.TimestampType(), True),
]

# Columns a schema rule must emit (R2 output contract,
# reference pkg/domain/model/policy.go:54-89 + docs/rule.md:155-164).
RULE_OUTPUT_COLUMNS = ("dataset", "table", "partition", "id", "timestamp", "data")
