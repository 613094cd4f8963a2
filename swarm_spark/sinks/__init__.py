from .base import Sink
from .dump import DumpSink
from .table import TableSink, envelope_schema

__all__ = ["DumpSink", "Sink", "TableSink", "envelope_schema"]
