"""Schema-inferred file readers, file utilities, and COPY helpers."""

from pg_datalake_spark.sources.readers import (  # noqa: F401
    infer_format,
    list_files,
    preview_schema,
    read_files,
)
from pg_datalake_spark.sources.writers import copy_from, copy_to  # noqa: F401
