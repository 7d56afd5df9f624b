"""JSON-Lines source/sink — the de-facto interchange format for training
corpora (one JSON document per line, gzip-friendly, splittable).

Spark mapping: ``spark.read.json`` with an explicit schema (inference costs
a full extra pass at 100 TB — always pass the schema in production) and
``recursiveFileLookup`` for date-sharded directory trees.  Uncompressed and
bzip2 files split by byte range across executors; per-file parallelism
otherwise.  Malformed lines follow Spark's PERMISSIVE mode: they land in
``_corrupt_record`` instead of failing the job, so a 100 TB ingest survives
the inevitable truncated shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL file/directory tree into a DataFrame.

    With ``keep_corrupt`` the PERMISSIVE ``_corrupt_record`` column is
    retained for quarantine pipelines; otherwise clean rows only.
    """
    # Clean path: DROPMALFORMED discards bad lines at parse time (PERMISSIVE
    # without the corrupt column would emit them as all-NULL rows, and
    # filtering on ONLY the corrupt column trips Spark's raw-JSON query
    # restriction).  Quarantine path: PERMISSIVE with the corrupt column in
    # the schema — callers must select data columns alongside it.
    reader = spark.read.option("recursiveFileLookup", "true").option(
        "mode", "PERMISSIVE" if keep_corrupt else "DROPMALFORMED"
    )
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if keep_corrupt:
            # Copy: StructType.add mutates in place, which would leak the
            # corrupt column into a caller-supplied schema object.
            schema = T.StructType(
                list(schema.fields)
                + [T.StructField("_corrupt_record", T.StringType())]
            )
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as JSONL part files (one JSON object per line)."""
    df.write.mode(mode).json(path)
