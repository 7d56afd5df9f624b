"""Data layout: bucketing and partition sizing.

Bucketing pre-shuffles a table by key at WRITE time so every future join or
aggregation on that key is shuffle-free — the Spark-native analog of the
reference's "primary key = sort order" RocksDB layout (storage/src/
table.rs:18-24).  At 100 TB, bucketing the fact tables on their join keys
(lineitem.l_orderkey ⋈ orders.o_orderkey) turns the biggest shuffle in the
TPC-H suite into a local zip of co-located buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | list[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: str | list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.  Joins
    between two tables bucketed identically on the join key skip the
    exchange entirely (verify with .explain: no Exchange under SortMergeJoin)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode("overwrite").format("parquet")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    writer.saveAsTable(table_name)


CHECKPOINT_DIR_CONF = "incresql.checkpoint.dir"


def materialize(df: DataFrame) -> DataFrame:
    """Materialize an intermediate that multiple downstream branches reuse
    (LSH signature tables, iterative-graph edge lists): compute it exactly
    once and truncate its lineage so re-scans read rows instead of
    re-running the producing pipeline.

    Default is an eager ``localCheckpoint`` — right for local mode and
    modest clusters, but its blocks live on executor-local storage and die
    with the executor.  For 1000-executor runs set the session conf
    ``incresql.checkpoint.dir`` to a reliable location (HDFS/object store):
    this helper then switches to ``sc.setCheckpointDir`` +
    ``df.checkpoint()``, whose RDD blocks survive executor loss.  The
    calling dataflow is identical either way — this helper is the single
    seam, and every operator that materializes goes through it.

    Cleanup: reliable checkpoint files are only reclaimed when the
    checkpointed RDD is garbage-collected AND
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` is true —
    ``session.get_spark`` sets it; a session built elsewhere should too,
    or a long-lived loop of materialize() calls leaks one intermediate
    copy per call onto shared storage.
    """
    spark = df.sparkSession
    ckpt_dir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if ckpt_dir:
        sc = spark.sparkContext
        # setCheckpointDir is idempotent for the same path; cheap to re-call.
        sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


#: capacity of the bounded auto-pin registry (see materialize_bounded)
AUTO_PIN_CAPACITY_CONF = "incresql.materialize.auto_pins"
#: per-SparkSession FIFO registries, weakly keyed — a stopped/dropped
#: session's entry disappears with the session instead of pinning dead
#: DataFrame handles for the life of the process, and two engines in one
#: process can no longer evict each other's pins (round-10 advice; the
#: registry used to be one process-global deque).
_auto_pins_by_session: "weakref.WeakKeyDictionary[SparkSession, deque]" = None  # type: ignore[assignment]


def materialize_bounded(df: DataFrame) -> DataFrame:
    """``materialize()`` whose pin is tracked in a bounded FIFO registry,
    scoped to the frame's SparkSession: once more than
    ``incresql.materialize.auto_pins`` (default 8) frames are outstanding
    in that session, the OLDEST is released automatically.

    This is the long-lived-session guard for operators that return a
    pinned result the caller may never release (text_dsir_select's score
    frame was the documented footgun: one doc-count-sized block set leaked
    per call).  Use it for returned results with consume-soon semantics —
    a caller holding a returned frame past the eviction window gets an
    unreadable frame (lineage truncated, blocks gone); frames a caller
    must hold indefinitely should use ``materialize()`` directly and own
    the release.  Releasing twice is harmless, so callers may still
    ``release()`` early."""
    global _auto_pins_by_session
    if _auto_pins_by_session is None:
        import weakref

        _auto_pins_by_session = weakref.WeakKeyDictionary()
    spark = df.sparkSession
    pins = _auto_pins_by_session.get(spark)
    if pins is None:
        from collections import deque

        pins = _auto_pins_by_session[spark] = deque()
    out = materialize(df)
    cap = int(spark.conf.get(AUTO_PIN_CAPACITY_CONF, "8"))
    pins.append(out)
    while len(pins) > cap:
        release(pins.popleft())
    return out


def release(df: DataFrame) -> None:
    """Free the storage blocks of a ``materialize()``d DataFrame once every
    consumer has read it.

    ``localCheckpoint`` persists an internal RDD that ``DataFrame.unpersist``
    cannot reach (the Dataset was never ``persist()``ed — the blocks hang off
    the ``LogicalRDD`` node), so a long-lived maintainer that materializes a
    delta per batch would otherwise accumulate one block set per batch for
    the life of the session.  This reaches through the analyzed plan to the
    checkpointed RDD and unpersists it.  AFTER release the frame is
    unreadable (its lineage was truncated — there is nothing to recompute
    from), so call it only when the materialized value is fully consumed.

    Safe on reliable-checkpoint frames too (files are reclaimed separately
    by the ContextCleaner on GC; unpersisting cached blocks is harmless) and
    a silent no-op on anything whose plan is not a bare LogicalRDD.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet sink (``path/col=value/...``).

    The write-side half of partition pruning: a reader filtering on a
    partition column touches only the matching directories — the scan's
    ``PartitionFilters`` prune before any file is opened, so a one-day query
    over a year of 100 TB events reads ~1/365th of the bytes.  Choose
    partition columns with bounded cardinality (date, region — never a
    high-cardinality key: millions of tiny directories kill the file
    listing and the write amplification)."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def partitions_for_bytes(
    total_bytes: int, target_partition_bytes: int = 128 * 1024 * 1024
) -> int:
    """Partition count that lands ~128 MB per partition (the sweet spot for
    parquet scans and shuffle spills alike)."""
    return max(1, math.ceil(total_bytes / target_partition_bytes))


def repartition_for_output(
    df: DataFrame, approx_rows: int, rows_per_file: int = 1_000_000
) -> DataFrame:
    """Coalesce to sensible output file counts (avoids the classic
    32-shuffle-partitions → 32 tiny files problem)."""
    return df.repartition(max(1, approx_rows // rows_per_file))
