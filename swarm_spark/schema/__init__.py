from .infer import align_to_schema, infer_batch_schema, infer_record_schema
from .merge import SchemaConflictError, merge_schemas, schemas_equal
from .strip import strip_record, strip_struct_column, strip_void_columns

__all__ = [
    "SchemaConflictError",
    "align_to_schema",
    "infer_batch_schema",
    "infer_record_schema",
    "merge_schemas",
    "schemas_equal",
    "strip_record",
    "strip_struct_column",
    "strip_void_columns",
]
