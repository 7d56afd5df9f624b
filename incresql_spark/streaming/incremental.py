"""Micro-batch incremental maintenance with Structured Streaming.

The reference's unfinished continuous mode was going to tail the storage
log sections and push deltas through operators (storage/src/storage.rs:26-65).
Structured Streaming IS that machinery on Spark: a file-source stream tails
a directory of appended files (≈ log sections), and ``foreachBatch`` applies
each micro-batch as a signed-frequency delta to downstream state.

The patterns:

- ``stream_into_table``     — continuous ingestion into a FreqTable: each
  micro-batch becomes one segment (append-only, O(batch)); a downstream
  MaterializedView.refresh() consumes those segments as deltas, chaining
  file-stream → multiset table → incremental MV end-to-end.
- ``stream_curate_ingest``  — the same ingestion with curation: quality
  filter + exact dedup against ALL history (content-hash anti-join on the
  table itself).
- ``stream_neardup_ingest`` — ingestion with history-wide NEAR-dup dedup:
  each micro-batch runs through the incremental MinHash-LSH maintainer
  and only docs that near-duplicate nothing seen before are appended.
- ``stream_embedding_ingest`` — the vector twin: micro-batches of
  embeddings through the incremental hyperplane-LSH maintainer; only
  vectors that semantically duplicate nothing seen before are appended.
- ``stream_dedup``          — time-bounded streaming dedup
  (dropDuplicatesWithinWatermark; state = rate × watermark horizon).
- ``stream_interval_join``  — watermarked stream-stream attribution join
  with bounded join state.
- ``windowed_counts``       — native watermarked tumbling-window
  aggregation, the idiomatic replacement for hand-rolled window state.

Scale: file-source streaming distributes file splits across executors;
state-store aggregations shard by key.  Nothing below collects to the
driver.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..commit import write_json_atomic
from ..frequency import FreqTable
from ..plans.layout import release as layout_release


def stream_into_table(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    table: FreqTable,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> StreamingQuery:
    """Tail ``source_dir`` and append each micro-batch to ``table`` as one
    freq segment.  availableNow trigger → drains what exists, then stops
    (deterministic for tests; drop the trigger for true continuous mode)."""
    stream = spark.readStream.schema(schema).format(fmt).load(source_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not table.exists():
            table.create(batch_df.schema)
        table.insert(batch_df)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within the
    watermark horizon — the ingestion-time guard a training-data feed runs
    before anything else touches the stream.

    ``dropDuplicatesWithinWatermark`` keys the state store by the dedup
    columns and EXPIRES entries once the watermark passes them, so state is
    bounded by (arrival rate × watermark), not by stream history — the
    property that keeps this viable on an unbounded 100 TB/day feed.
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


CURATE_STREAM_MIN_TOKENS = 20


def stream_curate_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    table: FreqTable,
    checkpoint_dir: str,
    min_tokens: int = CURATE_STREAM_MIN_TOKENS,
) -> StreamingQuery:
    """Streaming corpus ingestion with curation: each micro-batch of
    documents is quality-filtered, exact-deduped within the batch AND
    against everything already ingested, then appended to ``table`` — the
    shape a production training-data feed runs (dedup against the corpus
    so far, not just the stream window).

    The already-ingested side is the FreqTable itself: a 16-byte
    content-hash anti-join per batch (only hashes travel, never bodies).
    State is the table — durable, exact, unbounded-horizon — where
    dropDuplicatesWithinWatermark (stream_dedup) bounds state by TIME.
    availableNow trigger for deterministic tests; drop for continuous mode.
    """
    from ..operators.text import TOKENS_SPARK

    stream = spark.readStream.schema(schema).format("parquet").load(source_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not table.exists():
            table.create(batch_df.schema)
        clean = batch_df.filter(F.expr(f"size({TOKENS_SPARK}) >= {min_tokens}"))
        # in-batch keeper: min doc_id per content hash
        w = Window.partitionBy(F.md5("text"))
        keepers = clean.withColumn("__keep", F.min("doc_id").over(w)).filter(
            F.col("doc_id") == F.col("__keep")
        ).drop("__keep")
        existing = table.scan()
        if existing is not None and existing.take(1):
            seen = existing.select(F.md5("text").alias("__h")).distinct()
            keepers = keepers.join(
                seen, F.md5(keepers["text"]) == seen["__h"], "left_anti"
            )
        table.insert(keepers)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_neardup_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    corpus_table: FreqTable,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming corpus ingestion with history-wide NEAR-duplicate dedup:
    each micro-batch of documents runs through the incremental MinHash-LSH
    maintainer (delta signatures joined against the materialized band
    table), and only docs that are not near-duplicates of anything seen
    before are appended to ``corpus_table``.

    This upgrades ``stream_curate_ingest``'s exact content-hash anti-join
    to semantic near-dup matching — the C4/RefinedWeb ingestion shape —
    while keeping the same unbounded-horizon state model (durable FreqTable
    segments, not a time-bounded state store).

    Drop policy (standard keep-first): a batch doc is dropped when it
    near-dup-pairs with ANY previously ingested doc (kept or dropped —
    signature state remembers everything seen, so a chain of near-dups
    collapses to its first member), or with a smaller-doc_id doc in its
    own batch.  The pair evidence is byte-identical to batch
    ``dedup_minhash_lsh`` (tests/test_minhash_incremental.py).

    Scale: per batch, signature work is O(batch); history participates
    through 16-byte band keys only; the kept-doc append is one O(batch)
    segment write.  Nothing collects to the driver except the batch's own
    pair list (bounded by batch size × neighbors).

    Replay safety: foreachBatch is at-least-once — after a crash between
    the state/corpus writes and the streaming checkpoint commit, the SAME
    batch_id is re-delivered on restart.  Three layers make that safe:

    * a high-water ``(run_id, batch_id)`` marker in ``state_dir``, written
      atomically (temp file + ``os.replace``) AFTER all writes, makes a
      replay of a fully-applied batch a no-op.  The marker is keyed on the
      streaming checkpoint's query ``run id`` (``checkpoint_dir/metadata``),
      so wiping ``checkpoint_dir`` while keeping ``state_dir`` — which
      resets batch_id numbering to 0 — is detected as a NEW run rather than
      silently no-opping every redelivered batch against a stale high-water
      mark;
    * the corpus append itself is idempotent: kept docs anti-join the
      corpus table on doc_id (8-byte keys), so a crash AFTER
      ``corpus_table.insert`` but BEFORE the marker write cannot duplicate
      corpus rows on replay (the exact-dedup variant gets this from its
      content-hash anti-join; doc_id is the near-dup equivalent);
    * the remaining window — a crash BETWEEN ``add_batch``'s two state
      inserts — leaves the band/shingle state with freq-2 rows for one
      batch on replay.  Candidate generation is ``distinct()``-folded, so
      dedup DECISIONS stay correct; only the replayed batch's own pair
      LIST may carry duplicates.  This equals the partial-write exposure of
      the reference's single-writer table lock.
    """
    from .minhash_incremental import IncrementalMinHashDedup

    dedup = IncrementalMinHashDedup(spark, state_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.format("parquet").load(source_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _apply_neardup_batch(
            corpus_table,
            dedup,
            state_dir,
            batch_df,
            batch_id,
            run_id=_checkpoint_run_id(checkpoint_dir),
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _neardup_marker(state_dir: str) -> str:
    return os.path.join(state_dir, "_applied_batch.json")


def _checkpoint_run_id(checkpoint_dir: str) -> str | None:
    """The streaming query id from ``checkpoint_dir/metadata`` — stable for
    the life of a checkpoint, regenerated if the checkpoint is wiped.  That
    makes it the right key for the high-water marker: batch_id numbering
    restarts with the checkpoint, so a marker from an old run must not
    suppress the new run's batches."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as fh:
            return json.load(fh)["id"]
    except Exception:
        return None


def _apply_neardup_batch(
    corpus_table: FreqTable,
    dedup,
    state_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    run_id: str | None = None,
) -> None:
    """One micro-batch of document near-dup ingestion (see
    stream_neardup_ingest) — the doc_id/doc_a/doc_b instance of the
    generic ingest step."""
    _apply_ingest_batch(
        corpus_table, dedup.add_batch, "doc_id", ("doc_a", "doc_b"),
        state_dir, batch_df, batch_id, run_id,
    )


def _apply_ingest_batch(
    corpus_table: FreqTable,
    add_batch,
    id_col: str,
    pair_cols: tuple[str, str],
    state_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    run_id: str | None = None,
) -> None:
    """One micro-batch of near-dup-filtered ingestion, generic over the
    maintainer (minhash docs / hyperplane embeddings): ``add_batch`` takes
    the delta frame and returns verified pairs named ``pair_cols`` (each
    ordered a < b, >=1 end in the batch); rows keyed by ``id_col``.
    Idempotent per (run_id, batch_id) via the high-water marker in
    ``state_dir``; an unreadable/truncated marker is treated as absent so a
    crash mid-write can never brick the stream."""
    pa, pb = pair_cols
    marker = _neardup_marker(state_dir)
    try:
        with open(marker) as fh:
            m = json.load(fh)
        if m.get("run_id") == run_id and batch_id <= m["batch_id"]:
            return  # at-least-once replay of an already-applied batch
    except Exception:
        pass  # no marker, or torn write — fall through and rely on
        # the id anti-join below for corpus idempotency
    if not corpus_table.exists():
        corpus_table.create(batch_df.schema)
    batch_df = batch_df.localCheckpoint()  # stable across the two uses
    # pairs is pinned executor-side by add_batch (materialize) — neither
    # the batch nor its pair set ever collects to the driver.
    pairs = add_batch(batch_df)
    ids = batch_df.select(id_col)
    # Every pair involves >=1 batch row.  Drop set, per the policy:
    # - b of ANY pair, if it is a batch row (both-in-batch pairs keep
    #   the smaller id; history-partner pairs where the batch row
    #   sorted last);
    # - a of pairs whose b is HISTORY (then a is the batch row and the
    #   history partner wins regardless of id order).
    hist_b = pairs.join(ids, pairs[pb] == ids[id_col], "left_anti")
    drop_df = (
        pairs.select(pb)
        .unionByName(hist_b.select(F.col(pa).alias(pb)))
        .distinct()
    )
    kept = batch_df.join(
        F.broadcast(drop_df),
        batch_df[id_col] == drop_df[pb],
        "left_anti",
    )
    # Idempotent append: a replay of a batch whose corpus insert already
    # landed (crash before the marker write) must not duplicate rows.
    # (Unmerged scan: this very anti-join keeps corpus ids unique
    # across its append-only segments, so the freq merge is a no-op.)
    seen_ids = corpus_table.scan(expand=False, merged=False).select(
        id_col
    ).distinct()
    kept = kept.join(seen_ids, id_col, "left_anti")
    corpus_table.insert(kept)
    # The corpus insert consumed every materialized intermediate — free
    # their blocks so a long-lived stream doesn't accumulate one set per
    # micro-batch.
    layout_release(pairs)
    layout_release(batch_df)
    # Atomic marker update (write-then-rename via the shared control-file
    # helper): a crash mid-write leaves the OLD marker (or none), never a
    # truncated JSON that would make every restart die in json.load.
    write_json_atomic(marker, {"run_id": run_id, "batch_id": batch_id})


def stream_embedding_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    corpus_table: FreqTable,
    state_dir: str,
    checkpoint_dir: str,
    band_bits: int,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming EMBEDDING ingestion with history-wide semantic near-dup
    dedup — the vector twin of ``stream_neardup_ingest``: each micro-batch
    of (vec_id, embedding) rows runs through the incremental hyperplane-LSH
    maintainer (delta projections joined against the materialized band
    table), and only vectors that are not near-duplicates (cosine >=
    threshold) of anything seen before are appended to ``corpus_table`` —
    the SemDeDup-style ingestion gate an embedding store runs.

    ``band_bits`` fixes the index geometry up front (size for the corpus
    you expect — IncrementalEmbeddingDedup's contract; a re-band is an
    explicit state rebuild).  Same drop policy, replay marker, and
    idempotent-append machinery as the document stream (the generic
    ``_apply_ingest_batch``); same scale shape — history participates
    through band keys only, nothing collects to the driver.
    """
    from .embedding_incremental import IncrementalEmbeddingDedup

    dedup = IncrementalEmbeddingDedup(spark, state_dir, band_bits=band_bits)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.format("parquet").load(source_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _apply_ingest_batch(
            corpus_table,
            dedup.add_batch,
            "vec_id",
            ("vec_a", "vec_b"),
            state_dir,
            batch_df,
            batch_id,
            run_id=_checkpoint_run_id(checkpoint_dir),
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_interval_join(
    views: DataFrame,
    clicks: DataFrame,
    max_gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: each click paired with every view by the
    same user within ``max_gap`` BEFORE it — the streaming attribution join
    (the continuous twin of the batch ``op_range_join``).

    Both sides are watermarked and the join condition carries an explicit
    event-time range, which is what lets Spark BOUND the join state: a
    buffered view can be evicted once the click-side watermark passes
    ``v_ts + max_gap``, so state is (rate x horizon), not stream history.
    An inner interval join in append mode emits a pair exactly once, when
    both sides have arrived — no retraction needed.  Inputs: ``views``
    (user_id, ts, view_id), ``clicks`` (user_id, ts, click_id); works
    identically on batch DataFrames (same declarative plan).
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        "view_id",
    ).withWatermark("v_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        "click_id",
    ).withWatermark("c_ts", watermark)
    return c.join(
        v,
        F.expr(
            f"v_user = c_user AND v_ts <= c_ts "
            f"AND v_ts >= c_ts - INTERVAL {max_gap}"
        ),
    ).select("c_user", "click_id", "c_ts", "view_id", "v_ts")


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (streaming or
    batch input — the same declarative plan works for both)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
