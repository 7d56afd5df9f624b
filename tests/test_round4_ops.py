"""Semantic edge-case tests for the round-4 curation operators
(text_repetition, dedup_passages, op_percentiles) on tiny synthetic
fixtures — the oracle tests prove cross-engine agreement, these prove the
*intended* semantics on constructed inputs."""

from __future__ import annotations

import datetime

import pytest

from incresql_spark.operators import dedup, relational, text

from .conftest import SF_SMALL


def _write_documents(spark, tmp_path, rows):
    """rows: list of (doc_id, text). Writes the TESTDATA documents schema."""
    df = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_orders(spark, tmp_path, rows):
    """rows: list of (o_orderkey, o_totalprice, o_orderpriority)."""
    ts = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, k, "O", float(v), ts, p) for k, v, p in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


# --- text_repetition -------------------------------------------------------
def test_repetition_flags_degenerate_doc(spark, tmp_path):
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, "spam " * 50),  # one bigram repeated 49x -> frac ~0.98
            (2, " ".join(f"w{i}" for i in range(50))),  # all distinct -> 0.0
            (3, "solo"),  # <2 tokens: excluded entirely
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in text.text_repetition(spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_unique_bigrams"] == 1 and not out[1]["keep"]
    assert out[2]["dup_bigram_frac"] == 0.0 and out[2]["keep"]


def test_repetition_bigram_count_is_n_minus_1(spark, tmp_path):
    sf = _write_documents(spark, tmp_path, [(1, "a b c d e")])
    row = text.text_repetition(spark, sf).collect()[0]
    assert row["n_tokens"] == 5 and row["n_bigrams"] == 4


# --- dedup_passages --------------------------------------------------------
BLOCK = " ".join(f"b{i}" for i in range(dedup.PASSAGE_TOKENS))  # 16 tokens


def _unique_tokens(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_passages_detects_cross_doc_boilerplate(spark, tmp_path):
    # docs 1 and 2 share an identical aligned 16-token block; doc 3 is clean.
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, BLOCK + " " + _unique_tokens("x", 16)),
            (2, BLOCK + " " + _unique_tokens("y", 16)),
            (3, _unique_tokens("z", 32)),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in dedup.dedup_passages(spark, sf).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_shared_chunks"] == 1
    assert out[2]["n_shared_chunks"] == 1
    assert out[3]["n_shared_chunks"] == 0 and out[3]["keep"]
    # 1/2 shared is NOT below the 0.5 threshold -> dropped
    assert not out[1]["keep"]


def test_passages_short_doc_and_ragged_tail_excluded(spark, tmp_path):
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, _unique_tokens("a", dedup.PASSAGE_TOKENS - 1)),  # 0 full chunks
            (2, _unique_tokens("c", dedup.PASSAGE_TOKENS + 5)),  # tail dropped
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in dedup.dedup_passages(spark, sf).collect()}
    assert 1 not in out
    assert out[2]["n_chunks"] == 1


# --- op_time_window --------------------------------------------------------
def test_time_window_plan_is_narrow_projection(spark):
    """Tumbling windows must compile to epoch arithmetic (a projection), not
    a Generate/explode — only sliding windows may multiply rows."""
    from .conftest import SF_SMALL

    plan = (
        relational.op_time_window(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan and "Explode" not in plan


def test_time_window_epoch_alignment(spark, tmp_path):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 0, 4, 59)),
         (2, datetime.datetime(2024, 1, 1, 0, 5, 0))],
        "event_id long, ts timestamp",
    ).select("event_id", "ts", F.lit(1).alias("user_id"), F.lit("view").alias("event_type"), F.lit(0.0).alias("value"), F.lit("{}").alias("props"))
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    rows = relational.op_time_window(spark, str(tmp_path)).collect()
    starts = sorted(r["window_start"] for r in rows)
    assert starts == [
        datetime.datetime(2024, 1, 1, 0, 0),
        datetime.datetime(2024, 1, 1, 0, 5),
    ]


# --- op_rolling_window -----------------------------------------------------
def test_rolling_window_frame_boundary(spark, tmp_path):
    """RANGE 29 PRECEDING: an order exactly 29 days earlier is inside the
    30-day frame, 30 days earlier is outside."""
    ts = datetime.datetime
    rows = [
        (1, 1, "O", 10.0, ts(2024, 1, 1), "P"),
        (2, 1, "O", 20.0, ts(2024, 1, 30), "P"),  # day 29 after first: in
        (3, 1, "O", 40.0, ts(2024, 2, 29), "P"),  # 30 days after #2: out
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r["o_orderkey"]: r.asDict()
        for r in relational.op_rolling_window(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_orders_30d"] == 1 and out[1]["revenue_30d"] == 10.0
    assert out[2]["n_orders_30d"] == 2 and out[2]["revenue_30d"] == 30.0
    assert out[3]["n_orders_30d"] == 1 and out[3]["revenue_30d"] == 40.0


# --- op_percentiles --------------------------------------------------------
def test_percentiles_random_against_model(spark, tmp_path):
    """Seeded random data vs a 10-line Python model of the rank-selection
    definition (median = mean of ranks floor/ceil((n+1)/2), p90 = rank
    ceil(0.9n)) — validates the window/join/agg plumbing, group sizes 1..40."""
    import random

    rng = random.Random(42)
    rows, groups = [], {}
    key = 1
    for gi, size in enumerate([1, 2, 3, 7, 10, 25, 40]):
        g = f"G{gi}"
        vals = [round(rng.uniform(0, 1000), 2) for _ in range(size)]
        groups[g] = sorted(vals)
        for v in vals:
            rows.append((key, v, g))
            key += 1
    sf = _write_orders(spark, tmp_path, rows)
    out = {
        r["o_orderpriority"]: r.asDict()
        for r in relational.op_percentiles(spark, sf).collect()
    }
    for g, vals in groups.items():
        n = len(vals)
        lo, hi = (n + 1) // 2, (n + 2) // 2
        expect_med = (vals[lo - 1] + vals[hi - 1]) / 2.0
        expect_p90 = vals[(9 * n + 9) // 10 - 1]
        assert out[g]["n_orders"] == n
        assert out[g]["median_price"] == pytest.approx(expect_med)
        assert out[g]["p90_price"] == pytest.approx(expect_p90)


def test_percentiles_rank_selection(spark, tmp_path):
    # group A: values 1..10 -> median = (5+6)/2 = 5.5, p90 = ceil(9) = 9th = 9.0
    # group B: values 10,20,30 -> median = 20, p90 = ceil(2.7) = 3rd = 30
    rows = [(k, float(k), "A") for k in range(1, 11)]
    rows += [(100 + i, v, "B") for i, v in enumerate([10.0, 20.0, 30.0])]
    sf = _write_orders(spark, tmp_path, rows)
    out = {
        r["o_orderpriority"]: r.asDict()
        for r in relational.op_percentiles(spark, sf).collect()
    }
    assert out["A"]["n_orders"] == 10
    assert out["A"]["median_price"] == pytest.approx(5.5)
    assert out["A"]["p90_price"] == 9.0
    assert out["B"]["median_price"] == 20.0
    assert out["B"]["p90_price"] == 30.0


def test_image_phash_prefix_dups_are_hamming_zero(spark):
    """Docs sharing their 80-char text prefix carry identical synthetic
    images, so every such pair must surface with hamming == 0; and no
    emitted pair may exceed the Hamming ceiling."""
    from pyspark.sql import functions as F

    from incresql_spark.catalog import load_table
    from incresql_spark.operators import multimodal as mm

    d = load_table(spark, SF_SMALL, "documents")
    pref = d.select("doc_id", F.md5(F.substring("text", 1, mm.PHASH_PREFIX)).alias("p"))
    a = pref.select(F.col("doc_id").alias("doc_a"), "p")
    b = pref.select(F.col("doc_id").alias("doc_b"), "p")
    expected_zero = sorted(
        (r.doc_a, r.doc_b)
        for r in a.join(b, "p").filter(F.col("doc_a") < F.col("doc_b")).collect()
    )
    got = {(r.doc_a, r.doc_b): r.hamming for r in mm.mm_image_phash(spark, SF_SMALL).collect()}
    for pair in expected_zero:
        assert got.get(pair) == 0, f"identical-image pair {pair} missing or nonzero"
    assert all(h <= mm.PHASH_HAM_MAX for h in got.values())


def test_pack_sequences_invariants(spark):
    """Packing must tile the token stream: bins are contiguous, the last
    doc's bin_last is the total bin count - 1, and spans are consistent."""
    from incresql_spark.operators import text

    rows = text.text_pack_sequences(spark, SF_SMALL).collect()
    total_tokens = sum(r.n_tokens for r in rows)
    assert rows == sorted(rows, key=lambda r: r.doc_id)
    # reconstruct the running offset and check each doc's span
    cum = 0
    for r in rows:
        assert r.bin_first == cum // text.PACK_CAP
        cum += r.n_tokens
        assert r.bin_last == (cum - 1) // text.PACK_CAP
        assert r.n_bins == r.bin_last - r.bin_first + 1
    assert rows[-1].bin_last == (total_tokens - 1) // text.PACK_CAP


def test_semdedup_one_keeper_per_cluster(spark):
    from incresql_spark.operators import similarity as S

    rows = S.sim_dedup_semantic(spark, SF_SMALL).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    # Labels only ever decrease from the node's own id, so cluster_id is a
    # lower bound on member ids; a keeper is exactly the member whose id IS
    # the label.  Chains longer than the fixed iteration count may leave a
    # labeled group without its root (documented contract) — but never two
    # keepers, and the root, when present, must be flagged.
    n_keepers = 0
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m.is_keeper]
        assert len(keepers) <= 1
        assert all(m.vec_id >= cid for m in members)
        if any(m.vec_id == cid for m in members):
            assert len(keepers) == 1 and keepers[0].vec_id == cid
        n_keepers += len(keepers)
    assert n_keepers > 0


def test_mix_sources_rates_and_budget(spark):
    """Every kept doc's hash must clear its source rate, and the implied
    token keep-fraction must be in the budget's neighbourhood."""
    from incresql_spark.catalog import load_table
    from incresql_spark.operators import text
    from pyspark.sql import functions as F

    kept = text.text_mix_sources(spark, SF_SMALL)
    rows = kept.collect()
    assert len(rows) > 0
    d = load_table(spark, SF_SMALL, "documents")
    total = d.select(F.sum(F.size(F.expr(text.TOKENS_SPARK)))).collect()[0][0]
    kept_tokens = sum(r.n_tokens for r in rows)
    frac = kept_tokens / total
    assert 0.2 < frac < 0.8  # budget is 1/2; hash sampling wobbles


def test_winnow_finds_shared_substring_regardless_of_alignment(spark, tmp_path):
    """The winnowing guarantee: two docs sharing a substring of length >=
    K + W - 1 must pair, even when the shared region sits at completely
    different offsets in each doc (the case stride-sampled windows miss);
    docs with no shared region must not pair."""
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        # same substring, shifted by an arbitrary prefix (mis-aligned)
        (2, "a totally different and much longer preamble here: " + shared),
        (3, "completely unrelated content with no overlap whatsoever "
            "zebra xylophone quartz vortex blitz " * 3),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    got = {(r.doc_a, r.doc_b) for r in dedup.dedup_substring_winnow(spark, sf).collect()}
    assert (1, 2) in got
    assert all(3 not in pair for pair in got)


# --- text_sample_temperature ------------------------------------------------
def test_temperature_sampling_upsamples_small_languages(spark, tmp_path):
    """α=0.5 temperature sampling must give the low-resource language a
    strictly HIGHER keep threshold than the high-resource one (its corpus
    share is √-flattened), thresholds stay ≤ 1e6 ppm, and the selected
    counts land near n_docs·thr/1e6 (hash-gate expectation)."""
    rows = [(i, f"doc number {i} text") for i in range(330)]
    df = spark.createDataFrame(
        [
            (i, t, "en" if i < 300 else "de", "synth", len(t))
            for i, t in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.lang: r.asDict()
        for r in text.text_sample_temperature(spark, str(tmp_path)).collect()
    }
    assert out["en"]["n_docs"] == 300 and out["de"]["n_docs"] == 30
    # proportional sampling would keep 50% of each; √-temperature shifts
    # budget toward the small language
    assert out["de"]["thr_ppm"] > out["en"]["thr_ppm"]
    assert out["de"]["thr_ppm"] > 500_000 > out["en"]["thr_ppm"]
    for r in out.values():
        assert 0 <= r["thr_ppm"] <= 1_000_000
        assert 0 <= r["n_selected"] <= r["n_docs"]
    # overall budget ≈ half the corpus (hash wobble allowed)
    total_sel = sum(r["n_selected"] for r in out.values())
    assert 0.3 * 330 < total_sel < 0.7 * 330


# --- text_ccnet_bucket ------------------------------------------------------
def test_ccnet_bucket_terciles_are_balanced_and_ordered(spark):
    """Per-language tercile bucketing: each language's head/middle/tail
    counts differ by at most 1, and every head doc scores >= every tail
    doc within its language (rank cut, not threshold cut)."""
    out = text.text_ccnet_bucket(spark, SF_SMALL).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang) >= 2
    for lang, rs in by_lang.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r.bucket] += 1
        assert max(counts.values()) - min(counts.values()) <= 1, (lang, counts)
        heads = [r.lm_avg_df_ppm for r in rs if r.bucket == "head"]
        tails = [r.lm_avg_df_ppm for r in rs if r.bucket == "tail"]
        assert min(heads) >= max(tails), lang


# --- text_pii_scrub ----------------------------------------------------------
def test_pii_scrub_three_class_sequential_chain(spark, tmp_path):
    """The redaction chain masks email -> phone -> IPv4 in order, counting
    each class on the text state it actually scrubs; crafted docs cover
    multi-match, zero-match, all phone spellings, and the dotted-quad /
    phone disjointness that the chain ordering relies on."""
    sf = _write_documents(
        spark,
        tmp_path,
        [
            # doc 299: %3==2 -> IP graft; %5!=0 -> no rider.  Body adds one
            # of every class, with every phone spelling the pattern claims.
            (
                299,
                "mail First.Last+tag@sub.example.co.uk then +1 (212) 555-0000"
                " and (212) 555-0001 and 212-555-0002 and 555-0003"
                " from 255.255.255.255 end",
            ),
            # doc 300: %3==0 AND %5==0 -> email graft + rider (2nd email,
            # bare phone, one more IP).  Body itself is PII-free.
            (300, "clean body no digits here"),
            # doc 301: %3==1 -> phone graft only.
            (301, "also clean"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in text.text_pii_scrub(spark, sf).collect()}

    r = out[299]
    assert r["n_emails"] == 1
    assert r["n_phones"] == 4
    assert r["n_ips"] == 2  # body quad + grafted 'host 10.43.42.182'
    assert "<EMAIL>" in r["scrubbed"] and "@" not in r["scrubbed"]
    assert "555-" not in r["scrubbed"] and "(212)" not in r["scrubbed"]
    assert "255.255.255.255" not in r["scrubbed"]
    assert r["scrubbed"].count("<PHONE>") == 4

    r = out[300]
    assert r["n_emails"] == 2  # graft + rider
    assert r["n_phones"] == 1  # rider's bare 555-0000
    assert r["n_ips"] == 1  # rider's 192.168.44.1
    assert r["scrubbed"].endswith("and <IP> also <PHONE>")

    r = out[301]
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (0, 1, 0)
    assert "<EMAIL>" not in r["scrubbed"] and "<IP>" not in r["scrubbed"]
    # the +1 (415) prefix is consumed by the same match, not left behind
    assert "+1" not in r["scrubbed"] and "(415)" not in r["scrubbed"]


# --- text_boilerplate --------------------------------------------------------
def test_boilerplate_c4_line_rules(spark, tmp_path):
    """Each C4 rule drops its own exemplar: blocklist hit (punctuated,
    enough words), min-words (short footer), missing terminal punctuation
    (nav bar / plain prose); kept lines reassemble in position order."""
    sf = _write_documents(
        spark,
        tmp_path,
        [
            # doc 0 (mod 3 = 0): grafts = cookies + rights-reserved; 16
            # tokens -> exactly 2 content lines; punct lands on pos 0, 3.
            (0, " ".join(f"w{i:02d}" for i in range(16))),
            # doc 3 (mod 3 = 0, same grafts): 4 tokens -> ONE short content
            # line (4 words, punct at pos 0 -> kept at exactly min-words).
            (3, "alpha beta gamma delta"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in text.text_boilerplate(spark, sf).collect()}

    r = out[0]
    # 2 content lines + 2 grafted boilerplate lines
    assert r["n_lines"] == 4
    # line 0 gains '.': 8 words, clean -> KEPT.  line 1: no punct -> drop.
    # 'please accept cookies...' -> blocklist drop despite punct+words.
    # 'all rights reserved.' (pos 3 gains another '.') -> min-words AND
    # blocklist drop.
    assert r["n_kept"] == 1
    assert r["cleaned"] == " ".join(f"w{i:02d}" for i in range(8)) + "."

    r = out[3]
    assert r["n_lines"] == 3
    assert r["n_kept"] == 1  # exactly BOILER_MIN_WORDS words + grafted '.'
    assert r["cleaned"] == "alpha beta gamma delta."


def test_clean_lines_core_on_real_multiline_text(spark):
    """The reusable clean_lines() core (round-12 advice: reachable without
    the synthetic graft harness) over REAL newline-delimited text: every
    C4 rule has a keep and a drop exemplar, all-dropped and empty docs are
    EMPTIED (cleaned='') not removed, and kept lines reassemble in order."""
    df = spark.createDataFrame(
        [
            # each rule exercised: kept prose, punctuation-only drop
            # (nav bar), min-words drop (short footer), blocklist drop
            # (cookie notice — punctuated AND long enough)
            (1, "the quick brown fox jumps over the dog.\n"
                "home | about | contact\n"
                "short one.\n"
                "please accept cookies to continue browsing here.\n"
                "a second fine sentence stays in the document!"),
            (2, "every line here is boilerplate\nall rights reserved."),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    from incresql_spark.operators.text import clean_lines

    out = {r["doc_id"]: r.asDict() for r in clean_lines(df).collect()}
    assert set(out) == {1, 2, 3}

    r = out[1]
    assert r["n_lines"] == 5 and r["n_kept"] == 2
    assert r["cleaned"] == (
        "the quick brown fox jumps over the dog.\n"
        "a second fine sentence stays in the document!"
    )
    # all-dropped doc is emptied, not removed
    assert out[2] == {"doc_id": 2, "n_lines": 2, "n_kept": 0, "cleaned": ""}
    # empty text -> one empty line -> dropped -> emptied
    assert out[3] == {"doc_id": 3, "n_lines": 1, "n_kept": 0, "cleaned": ""}
