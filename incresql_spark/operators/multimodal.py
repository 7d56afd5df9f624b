"""Multimodal column plumbing — image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed through Arrow-batched
``mapInPandas`` (the pattern a 100 TB media pipeline runs on Spark).

The container has no image/audio codecs, so the DECODE step is stubbed
(`decode_image` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic md5-seeded pixel tensor).  Everything around the
stub is real and tested: the schema contract, the Arrow batch shape, the
partition-parallel UDF execution, and the feature-extraction output schema.

Scale notes:
- payloads travel as parquet binary; Spark never materializes more than a
  batch per core (``spark.sql.execution.arrow.maxRecordsPerBatch``).
- metadata (width/height/format) lives in plain columns so filters prune
  files BEFORE any payload is decoded — the scan reads only the metadata
  columns for a metadata-only query (column pruning on parquet).
- decode+featurize is a narrow map: no shuffle, linear scaling.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, fmt STRING, width INT, height INT, "
    "payload BINARY"
)

FEATURES_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, feature ARRAY<DOUBLE>"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: payload =
    repeated md5 bytes of the text (stands in for an encoded image)."""
    from ..catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.lit("fake/raw").alias("fmt"),
        (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 16).cast("int").alias("height"),
        F.unhex(F.md5("text")).alias("payload"),
    )


def decode_image(payload: bytes, fmt: str, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    Real codecs (PIL/cv2) are not in this container — the real path is a
    clearly-marked stub; ``fake=True`` produces a deterministic tensor from
    the payload hash so the downstream plumbing is fully testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/cv2 which are not installed; "
            "run with fake=True for the deterministic test tensor"
        )
    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas decode→featurize: per-payload deterministic feature
    vector (mean/std per channel + byte stats).  Arrow-batched; each task
    processes its partition independently."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), "fake/raw", fake=True)
                channel_means = img.mean(axis=(0, 1)) / 255.0
                channel_stds = img.std(axis=(0, 1)) / 255.0
                feats.append(
                    [float(x) for x in channel_means]
                    + [float(x) for x in channel_stds]
                    + [float(len(payload)), float(img.size)]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(featurize, schema=FEATURES_SCHEMA)


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable query: metadata + feature dims over the synthetic
    media table (rows-only check: the md5-seeded tensor is deterministic,
    but numpy isn't expressible in DuckDB SQL)."""
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    return (
        feats.select(
            "doc_id",
            "n_bytes",
            F.size("feature").alias("feature_dim"),
            F.round(F.expr("aggregate(feature, 0D, (a, x) -> a + x)"), 6).alias(
                "feature_sum"
            ),
        )
        .orderBy("doc_id")
    )


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy — deterministic, codec-free).
    Production swaps this for PIL/cv2 resampling; the Spark-side batch
    plumbing is identical either way."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


RESIZED_SCHEMA = "doc_id BIGINT, out_w INT, out_h INT, checksum BIGINT"


def mm_resize(spark: SparkSession, sf_dir: str, out_hw: tuple[int, int] = (8, 8)) -> DataFrame:
    """Decode → resize pipeline over mapInPandas (rows-only check: the
    tensor math isn't SQL-expressible; determinism is unit-tested)."""
    out_h, out_w = out_hw

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), "fake/raw", fake=True)
                sums.append(int(resize_image(img, out_h, out_w).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": np.int32(out_w),
                    "out_h": np.int32(out_h),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    media = synthesize_media(spark, sf_dir)
    return media.mapInPandas(run, schema=RESIZED_SCHEMA).orderBy("doc_id")


FRAME_STRIDE = 2

FRAMES_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_hash STRING"


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: every FRAME_STRIDE-th frame of each synthetic
    clip (n_frames derived from doc length), one output row per kept frame.

    The sampler runs in mapInPandas exactly as a real video pipeline would
    (payload in, per-frame records out, Arrow-batched, shuffle-free); the
    deterministic frame ids/hashes make it DuckDB-oracle-checkable.
    """
    from ..catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    clips = d.select(
        "doc_id",
        F.md5("text").alias("payload_hex"),
        ((F.col("n_chars") % 10) + 2).cast("int").alias("n_frames"),
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, hex_, n in zip(
                pdf["doc_id"], pdf["payload_hex"], pdf["n_frames"]
            ):
                for i in range(0, int(n), FRAME_STRIDE):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(f"{hex_}-{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return clips.mapInPandas(sample, schema=FRAMES_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


MM_FRAME_SAMPLE_SQL = f"""
SELECT d.doc_id,
       CAST(u.idx AS INT) AS frame_idx,
       md5(md5(d.text) || '-' || CAST(u.idx AS INT)) AS frame_hash
FROM documents d,
     UNNEST(range(0, (d.n_chars % 10) + 2, {FRAME_STRIDE})) AS u(idx)
ORDER BY d.doc_id, frame_idx
"""

QUERIES = {
    "mm_features": mm_features,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
}
# mm_features / mm_resize are rows-only: numpy tensor math isn't
# SQL-expressible.  mm_frame_sample's sampler is deterministic → full oracle.
ORACLE: dict[str, str] = {"mm_frame_sample": MM_FRAME_SAMPLE_SQL}
