from .ingest import META_DEST, IngestPipeline, IngestStats

__all__ = ["META_DEST", "IngestPipeline", "IngestStats"]
