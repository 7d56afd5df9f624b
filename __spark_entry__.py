"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Registration order matters: the driver's correctness gate records the FIRST
50 entries of ``queries()``.  The first 50 here are the substantive
operators — TPC-H (22), the custom relational operators (as-of join, range
join, window functions), the dedup / similarity / multimodal suite,
sessionization, the composed end-to-end curation dataflows
(pipeline_curate / pipeline_pretrain), BOTH incremental join-MV gate
queries (mv_q3_incremental inner, mv_q13_incremental left-outer — round
9), and a rotating head of the text suite.  Slots ROTATE each round so
long-unverified queries gain driver evidence (the round-6/7 DECIMAL
lesson: a fetch-path mismatch can be invisible to every local check).
Round 17 promoted the three round-16 newcomers
(dedup_contamination_bloom_only, dedup_contamination_bloom_incremental,
text_cms_grouped_incremental) — zero driver-fetch evidence outranks
every staleness candidate under the post-burn-down policy — and demoted
dedup_minhash_lsh, dedup_embedding and text_stats, each 16 rounds
driver-green with its mechanism still gated by a sibling (per-row
rationale in _GATE_DEMOTED and _GATE_TEXT).  Everything past the cap is equally
oracle-checked locally via ``tools/check_oracle.py`` and pytest (all
registered queries locally value-hash-matched — the exact count is
asserted against this docstring by tests/test_entry_gate.py: 129
queries total; oracle output types are additionally linted — HUGEINT
and DECIMAL rejected — after driver-only hash mismatches in rounds 2-4
and 6-7).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incresql_spark import tpch
from incresql_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    relational,
    similarity,
    text,
)
from incresql_spark.streaming import sessionize

SF0001 = "/root/testdata/sf0.001"

# Substantive relational operators that must sit inside the driver gate;
# everything else in relational.QUERIES is a demo of a built-in Spark op.
# (op_funnel rotated to the tail in round 9 — window-shape mechanism is
# gate-covered by op_window_functions + events_sessionize.  Round 10
# promotes op_percentiles / op_time_window / op_rolling_window — each a
# distinct single-shuffle shape with zero driver evidence until now.)
_RELATIONAL_CORE = (
    "op_asof_join",
    "op_range_join",
    "op_window_functions",
    # Round 11: explicit hot-key salting proven result-invariant against
    # the plain-join oracle — the one skew lever AQE cannot always supply.
    "op_salted_join",
    # Round 12 (burn-down schedule, VERDICT r11 task 1): the six cheapest
    # never-driver-fetched rows — CUBE/GROUPING SETS/PIVOT rollup shapes,
    # full-outer NULL-padding both sides, cohort retention (self-join over
    # time buckets) and equi-width histogramming.  Round 16 rotates five
    # of the six back to the tail after 4 driver-green rounds each,
    # keeping op_grouping_sets as the class representative (CUBE and
    # PIVOT are sugar over the same grouping-sets expansion + conditional
    # agg, whose CASE-agg leg tpch_q14 also gates; op_full_outer_join's
    # NULL-pad-both-sides is gated by mv_q13_incremental's left-outer pad
    # + tpch_q21's multi-join; op_retention_cohorts' time-bucket self-join
    # by op_asof_join/op_range_join + events_sessionize; op_histogram's
    # equi-width bucket agg by op_quantile_grouped's distribution report
    # and text_sample_temperature's integer bucketing).
    "op_grouping_sets",
    # Round 13 (final burn-down slot, VERDICT r12 task 1): Pearson
    # correlation over integer sums — the last never-driver relational row.
    "op_corr",
    # Round 14 (VERDICT r13 task 1): the deterministic HLL sketch — one of
    # the six round-13 newcomers with zero driver-fetch evidence, all
    # promoted this round per the staleness policy (zero evidence outranks
    # every staleness candidate; the six emit DOUBLE columns, the class
    # that produced invisible fetch-path mismatches in rounds 6-7).
    "op_hll_distinct",
    # Round 15 (VERDICT r14 task 1): the three round-14 relational
    # newcomers — bottom-k quantile sketch (global + grouped) and the KMV
    # set-cardinality algebra — zero driver-fetch evidence outranks every
    # staleness candidate.  op_percentiles / op_time_window /
    # op_rolling_window rotate to the tail to make room (rationale at
    # their _GATE_DEMOTED-style note below): each is 5 rounds driver-green
    # and its plan class keeps a gated sibling — exact percentiles by the
    # incoming quantile sketches (same analytical question, sketch is the
    # 100 TB path), time-bucket aggregation by events_sessionize +
    # op_histogram, rolling frames by op_window_functions.
    "op_quantile_sketch", "op_quantile_grouped", "op_kmv_set_ops",
    # Round 16 (VERDICT r15 task 1): the grouped HLL sketch — one of the
    # six round-15 newcomers, all promoted on the zero-driver-evidence
    # rule (DOUBLE estimate column, the rounds-6/7 fetch-mismatch class).
    "op_hll_grouped",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    return tpch.q1(spark, SF0001)


# Demoted below the gate cap: entries whose mechanism is already
# gate-covered by a richer sibling.  Round-6 demotions: sim_label_centroids
# (sim_kmeans runs the same aggregation per iteration), mm_resize
# (mm_features' Arrow mapInPandas plumbing).  Round-9 rotation (VERDICT r8
# task 2): dedup_simhash (banded-bucket mechanism gated via
# dedup_minhash_lsh + dedup_embedding + mm_image_phash), mm_frame_sample
# (mm_audio_chunks covers deterministic chunked Arrow decode), sim_kmeans
# and sim_topk_cosine (sim_ann_ivf gates broadcast-centroid assignment and
# exact-cosine verify) — all driver-green 3+ rounds — making room for the
# never-driver-verified text tail and dedup_url.
_GATE_DEMOTED = (
    "sim_label_centroids", "mm_resize",
    "dedup_simhash", "mm_frame_sample", "sim_kmeans", "sim_topk_cosine",
    # Round-10 rotation (VERDICT r9 tasks 1-2): six slots free up for
    # dedup_minhash_incremental (the streaming maintainer's first driver
    # evidence), the three promoted relational shapes, and two text ops.
    # Demoted — each driver-green for 9 straight rounds with its mechanism
    # still gated by a sibling: sim_ann_lsh (sim_ann_ivf / sim_knn_graph /
    # sim_dedup_semantic share the LSH-bucket + exact-verify path), and
    # five TPC-H whose plan class stays gated — q2 (correlated min
    # subquery; q17/q20 gate scalar subqueries), q9 (multi-way join agg;
    # q5/q7/q8), q11 (group agg vs global-threshold subquery; q15), q16
    # (anti-join distinct agg; q4/q21), q22 (avg scalar subquery + anti
    # join; q17).
    "sim_ann_lsh", "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q16", "tpch_q22",
    # Round-11 rotation (VERDICT r10 task 1): six slots free up for the
    # round-10 tail newcomers (dedup_passages_incremental,
    # dedup_embedding_incremental, dedup_canonical, text_sample_temperature,
    # text_ccnet_bucket, op_salted_join) — none ever driver-fetched.
    # Demoted — each driver-green for 10 straight rounds with its
    # mechanism still gated by a sibling: tpch_q4 (EXISTS semi; q21 gates
    # exists/anti), tpch_q17 (scalar avg subquery; q15's global-max
    # threshold + q18's IN-agg subquery stay gated), tpch_q20 (nested IN
    # subqueries; q18/q21), mm_features (Arrow mapInPandas plumbing gated
    # via mm_audio_chunks + mm_image_phash), dedup_passages (chunk-hash
    # mechanism now gated by dedup_passages_incremental, whose oracle IS
    # the batch recompute), sim_dedup_semantic (LSH-bucket + exact-verify
    # path gated by sim_knn_graph / sim_ann_ivf).
    "tpch_q4", "tpch_q17", "tpch_q20", "mm_features", "dedup_passages",
    "sim_dedup_semantic",
    # Round-12 rotation (VERDICT r11 task 1): six slots free up for the
    # scheduled burn-down promotions (op_cube, op_grouping_sets, op_pivot,
    # op_full_outer_join, op_retention_cohorts, op_histogram — none ever
    # driver-fetched).  Demoted — each driver-green for 11 straight rounds
    # with its mechanism still gated by a sibling: tpch_q3 (join+agg+TopK;
    # q10 gates the TakeOrderedAndProject class and mv_q3_incremental's
    # oracle IS q3's batch recompute), tpch_q8 (multi-way join agg; q5/q7),
    # tpch_q12 (join + CASE-conditional agg; q14), dedup_url (digest
    # normalize + hash groupBy; dedup_exact), sim_knn_graph (LSH bucket +
    # exact-cosine verify; sim_ann_ivf), mm_audio_chunks (chunked Arrow
    # mapInPandas decode; mm_image_phash).
    "tpch_q3", "tpch_q8", "tpch_q12", "dedup_url", "sim_knn_graph",
    "mm_audio_chunks",
    # Round-13 rotation (VERDICT r12 task 1 — the FINAL burn-down round):
    # six slots free up for the last never-driver-fetched rows (op_corr,
    # text_pack_sequences, text_chunk_overlap, text_mix_sources,
    # text_bpe_tokenize, text_boilerplate), reducing the never-driver tail
    # to ZERO.  Demoted — each long driver-green with its mechanism still
    # gated by a sibling: tpch_q5 (multi-way join agg, 12 rounds; q7/q21
    # gate the class), tpch_q13 (left-outer groupBy count, 12 rounds;
    # mv_q13_incremental stays gated and its oracle IS q13's batch
    # recompute — the r12 q3/mv_q3 precedent), tpch_q19 (OR-of-ANDs
    # non-equi residual join, 12 rounds; q7's residual + q14's CASE agg
    # stay gated), text_bpe_merges (4 rounds; incoming text_bpe_tokenize
    # TRAINS the same merge table when none is passed, so its oracle
    # recomputes the full replace-chain learning loop), text_dsir_select
    # (4 rounds; single-Generate + broadcast-table class gated by incoming
    # text_boilerplate + text_mix_sources), dedup_substring_winnow (4
    # rounds; gram-explode + df-capped inverted-index pairing gated by
    # dedup_ngram_jaccard, chunk-hash keys by dedup_passages_incremental).
    "tpch_q5", "tpch_q13", "tpch_q19", "text_bpe_merges",
    "text_dsir_select", "dedup_substring_winnow",
    # POST-BURN-DOWN ROTATION POLICY (round 13+, VERDICT r12 task 7):
    # every registered query now has at least one round of driver-fetch
    # evidence, so rotation's purpose shifts from coverage to STALENESS.
    # Each round, any row whose last driver fetch is ≥ 4 rounds old is a
    # promotion candidate; promote the six staleest, breaking ties by
    # plan-class uniqueness (a row whose plan class has no currently-gated
    # sibling outranks one that has) and demote the longest-green rows
    # whose class keeps a gated sibling, documented per row as above.
    # Round-16 rotation executed (VERDICT r15 task 1): the six round-15
    # newcomers entered the gate.  Round-17 candidates by this rule: the
    # three round-16 newcomers (dedup_contamination_bloom_only,
    # dedup_contamination_bloom_incremental,
    # text_cms_grouped_incremental) have ZERO driver evidence and
    # outrank every staleness candidate; the staleest tail rows behind
    # them are sim_label_centroids (r5), mm_resize (r5), dedup_simhash
    # (r8), mm_frame_sample (r8), sim_kmeans (r8), sim_topk_cosine (r8).
    # Round-14 rotation (VERDICT r13 task 1): the six round-13 newcomers
    # (op_hll_distinct, op_hll_incremental, text_cms_heavyhitters,
    # text_gopher_quality, text_bm25_search, sim_quantize_int8) enter the
    # gate — zero driver-fetch evidence outranks every staleness candidate,
    # and all six emit DOUBLE columns, the rounds-6/7 mismatch class.
    # Demoted to make room, each with its mechanism still gated by a
    # sibling: tpch_q1 (13 rounds driver-green; lineitem group-agg + sort
    # gated by q18/q14, AND still smoke-checked EVERY round because
    # entry() itself runs q1 at sf0.001 — only the value-hash leg rotates
    # out), tpch_q6 (13 rounds; scan-filter + global agg gated by q14's
    # filtered conditional agg and q15's agg-threshold), tpch_q10 (13
    # rounds; join+agg+TakeOrderedAndProject gated by q18's identical
    # TakeOrdered top-100 and q7's multi-way join agg), text_lm_score (5
    # rounds; integer-ppm narrow projection gated by text_stats, and
    # gated dedup_canonical embeds the ENTIRE lm_score pipeline in both
    # its plan and its oracle), text_oov (4 rounds; broadcast-vocab
    # membership projection gated by text_stats + incoming
    # text_gopher_quality's required-words membership count),
    # pipeline_pretrain (9 rounds; composed curation dataflow gated by
    # pipeline_curate, with its mixing/packing stages individually gated
    # via text_mix_sources + text_pack_sequences).
    "tpch_q1", "tpch_q6", "tpch_q10", "text_lm_score", "text_oov",
    "pipeline_pretrain",
    # Round-15 rotation (VERDICT r14 task 1): the five round-14 newcomers
    # enter the gate (the text_cms_incremental / op_quantile_incremental
    # pins that held them in the tail during round 14 are removed — they
    # now flow into the gate via the pipeline registry; the relational
    # trio enters via _RELATIONAL_CORE).  Demoted to make room, each with
    # its mechanism still gated by a sibling: tpch_q15 (14 rounds
    # driver-green; agg + join-on-max threshold gated by q18's
    # HAVING-sum top-k and q21's multi-way join), text_ccnet_bucket (4
    # rounds; broadcast integer-table scoring + bucketing gated by
    # text_sample_temperature's identical integer-quantized broadcast
    # class), and op_percentiles / op_time_window / op_rolling_window
    # (5 rounds each; rationale in the _RELATIONAL_CORE note — these
    # rotate out of the whitelist rather than being pinned here).
    "tpch_q15",
    # Round-16 rotation (VERDICT r15 task 1): the six round-15 newcomers
    # enter the gate (their round-15 tail pins are removed — the grouped
    # maintainers and dedup_contamination_bloom now flow into the gate
    # via the pipeline/dedup registries; op_hll_grouped enters via
    # _RELATIONAL_CORE, text_bm25_table / text_cms_grouped via
    # _GATE_TEXT).  Demoted to make room: five of the six round-12
    # burn-down relational rows rotate out of the _RELATIONAL_CORE
    # whitelist (rationale there), and dedup_contamination (15 rounds
    # driver-green) rotates here — the incoming dedup_contamination_bloom
    # gate shape carries the SAME broadcast-screen pipeline with the
    # exact-overlap ride-along as verification, so the mechanism stays
    # gated with strictly more coverage (bloom + exact in one row).
    "dedup_contamination",
    # Round-17 rotation (VERDICT r16 task 1): the three round-16
    # newcomers (dedup_contamination_bloom_only,
    # dedup_contamination_bloom_incremental, text_cms_grouped_incremental)
    # enter the gate — their round-16 tail pins are removed and they flow
    # in via the dedup.py / pipeline.py registry gate blocks; zero
    # driver-fetch evidence outranks every staleness candidate.  Demoted
    # to make room, each the longest-green row whose plan class keeps a
    # gated sibling: dedup_minhash_lsh (16 rounds driver-green; the
    # banded-LSH near-dup mechanism stays gated via
    # dedup_minhash_incremental, whose oracle IS the batch minhash
    # recompute — the r11 dedup_passages / r13 tpch_q13 precedent),
    # dedup_embedding (16 rounds; hyperplane-LSH banded buckets stay
    # gated via dedup_embedding_incremental, same oracle-is-the-batch
    # precedent), and text_stats (16 rounds; the zero-shuffle
    # integer-stats projection class stays gated via text_repetition +
    # text_gopher_quality — rotated out of the _GATE_TEXT whitelist
    # rather than pinned here).
    "dedup_minhash_lsh",
    "dedup_embedding",
    # Round-17 NEW rows start in the tail like every newcomer (zero
    # driver evidence -> top promotion candidates for round 18):
    # text_cms_retract_incremental (retraction wave through the CMS
    # maintainer — net-corpus report hash-EQUAL to the batch operator)
    # and mv_q3_incremental_batched (one refresh consuming all three
    # delta windows — hash-EQUAL to the per-wave cycle) and
    # mv_cascade_incremental (two-level MV cascade: an aggregate MV
    # maintained over another aggregate MV's changelog — hash-EQUAL to
    # the from-scratch two-level recompute) and mv_cascade_q3_incremental
    # (the same cascade over the Q3 JOIN view — per-table seq VECTOR
    # cursors on the changelog) are registry-listed in pipeline.py's
    # gate block, so they are pinned here until promotion.
    "text_cms_retract_incremental",
    "mv_q3_incremental_batched",
    "mv_cascade_incremental",
    "mv_cascade_q3_incremental",
)

# Text-suite entries promoted into the gate (round 9): text_stats (gated
# since round 1) plus the three whose only evidence was local.  Round 10
# adds text_repetition and text_oov (never driver-verified).
_GATE_TEXT = (
    # (Round 17: text_stats rotates to the tail after 16 driver-green
    # rounds — the zero-shuffle integer-stats projection class stays
    # gated via text_repetition + text_gopher_quality — freeing a slot
    # for the round-16 newcomers; rationale in _GATE_DEMOTED.)
    "text_repetition",
    # Round 11: the mT5 temperature-sampling recipe (integer-quantized
    # weights, zero float accumulation) and the CCNet per-language
    # perplexity terciles — both round-10 additions, never driver-fetched.
    # (Round 15: text_ccnet_bucket rotates to the tail after 4 green
    # rounds — same broadcast integer-table class as the gated
    # text_sample_temperature — freeing a slot for text_cms_incremental.)
    "text_sample_temperature",
    # Round 13 (final burn-down): the five remaining never-driver text
    # rows — sequence packing (two-level prefix sum), overlapping chunker,
    # source mixing (broadcast budgets), BPE train-then-apply, and the C4
    # boilerplate line filter (new in round 12).  text_bpe_merges and
    # text_dsir_select rotate to the tail (see _GATE_DEMOTED).
    "text_pack_sequences", "text_chunk_overlap", "text_mix_sources",
    "text_bpe_tokenize", "text_boilerplate",
    # Round 14 (VERDICT r13 task 1): the three round-13 text newcomers —
    # Gopher word-level quality rules, BM25 top-k search, and the
    # Count-Min heavy-hitter sketch — all zero-driver-evidence promotions
    # (text_lm_score and text_oov rotate to the tail, see _GATE_DEMOTED).
    "text_gopher_quality", "text_bm25_search", "text_cms_heavyhitters",
    # Round 16 (VERDICT r15 task 1): the two round-15 text newcomers —
    # the table-driven BM25 gate query (workload-as-data through the
    # production search path) and the per-group CMS heavy-hitter report.
    "text_bm25_table", "text_cms_grouped",
)


def _ordered(registries: list[dict]) -> dict:
    out: dict = {}
    # Gate-priority block: TPC-H, core relational ops, then the full
    # LLM-pipeline suite (dedup, similarity, multimodal, sessionize,
    # composed pipelines + incremental MVs, promoted text entries).
    (tpch_reg, rel_reg, text_reg, dedup_reg, sim_reg, mm_reg, sess_reg,
     pipe_reg) = registries
    out.update({k: v for k, v in tpch_reg.items() if k not in _GATE_DEMOTED})
    for k in _RELATIONAL_CORE:
        if k in rel_reg:
            out[k] = rel_reg[k]
    for reg in (dedup_reg, sim_reg, mm_reg, sess_reg, pipe_reg):
        out.update({k: v for k, v in reg.items() if k not in _GATE_DEMOTED})
    for k in _GATE_TEXT:
        if k in text_reg:
            out[k] = text_reg[k]
    # Tail block: rest of the text suite, built-in-operator demos and
    # demoted entries (driver-gate overflow is OK here; everything is
    # still locally oracle-checked).
    for reg in (text_reg, dedup_reg, sim_reg, mm_reg, rel_reg, tpch_reg,
                sess_reg, pipe_reg):
        for k, v in reg.items():
            if k not in out:
                out[k] = v
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(
        [
            tpch.QUERIES,
            relational.QUERIES,
            text.QUERIES,
            dedup.QUERIES,
            similarity.QUERIES,
            multimodal.QUERIES,
            sessionize.QUERIES,
            pipeline.QUERIES,
        ]
    )


def oracle_sql() -> dict[str, str]:
    return _ordered(
        [
            tpch.ORACLE,
            relational.ORACLE,
            text.ORACLE,
            dedup.ORACLE,
            similarity.ORACLE,
            multimodal.ORACLE,
            sessionize.ORACLE,
            pipeline.ORACLE,
        ]
    )
