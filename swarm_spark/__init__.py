"""swarm-spark: a PySpark-native, rule-driven ingestion/analytics engine.

Re-imagines the capabilities of m-mizutani/swarm (rule-routed JSON log
ingestion with evolving schemas) on idiomatic Spark primitives, plus the
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) needed at 100 TB scale. See SURVEY.md for the
blueprint and file:line parity citations.
"""

from .model import (
    CompressType,
    LoadRequest,
    ModelError,
    ObjectMeta,
    ObjectRef,
    ParserType,
    Source,
    TableDest,
    TimeUnit,
    parse_object_url,
)
from .session import get_spark

__all__ = [
    "CompressType",
    "LoadRequest",
    "ModelError",
    "ObjectMeta",
    "ObjectRef",
    "ParserType",
    "Source",
    "TableDest",
    "TimeUnit",
    "get_spark",
    "parse_object_url",
]

__version__ = "0.1.0"
