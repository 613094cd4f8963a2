from .base import Sink
from .bigquery import BigQuerySink, BigQuerySinkUnavailable
from .dump import DumpSink
from .table import TableSink, TableTransaction, envelope_schema

__all__ = [
    "BigQuerySink",
    "BigQuerySinkUnavailable",
    "DumpSink",
    "Sink",
    "TableSink",
    "TableTransaction",
    "envelope_schema",
]
