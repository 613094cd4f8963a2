from .base import Sink
from .bigquery import BigQuerySink, BigQuerySinkUnavailable
from .dump import DumpSink
from .table import TableSink, envelope_schema

__all__ = [
    "BigQuerySink",
    "BigQuerySinkUnavailable",
    "DumpSink",
    "Sink",
    "TableSink",
    "envelope_schema",
]
