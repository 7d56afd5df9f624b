"""The driver's correctness gate records the FIRST 50 of
``__spark_entry__.queries()`` — registration order IS the gate.  Pin the
composition so a refactor cannot silently rotate queries in or out of
driver evidence; a deliberate rotation updates this list in the same
commit (round-17 composition — the three round-16 newcomers promoted on
the zero-driver-evidence rule; demotion rationale per row in
__spark_entry__._GATE_DEMOTED and _GATE_TEXT)."""

from __future__ import annotations

GATE_50 = [
    "tpch_q7", "tpch_q14", "tpch_q18", "tpch_q21",
    "op_asof_join", "op_range_join", "op_window_functions",
    "op_salted_join",
    "op_grouping_sets", "op_corr",
    "op_hll_distinct",
    "op_quantile_sketch", "op_quantile_grouped", "op_kmv_set_ops",
    "op_hll_grouped",
    "dedup_exact", "dedup_ngram_jaccard",
    "dedup_clusters", "dedup_contamination_bloom",
    "dedup_contamination_bloom_only",
    "sim_ann_ivf", "sim_quantize_int8",
    "mm_image_phash",
    "events_sessionize", "pipeline_curate",
    "mv_q3_incremental", "mv_q13_incremental", "dedup_minhash_incremental",
    "dedup_passages_incremental", "dedup_embedding_incremental",
    "dedup_canonical", "op_hll_incremental",
    "text_cms_incremental", "op_quantile_incremental",
    "op_hll_grouped_incremental", "op_quantile_grouped_incremental",
    "dedup_contamination_bloom_incremental", "text_cms_grouped_incremental",
    "text_repetition",
    "text_sample_temperature",
    "text_pack_sequences", "text_chunk_overlap", "text_mix_sources",
    "text_bpe_tokenize", "text_boilerplate",
    "text_gopher_quality", "text_bm25_search", "text_cms_heavyhitters",
    "text_bm25_table", "text_cms_grouped",
]


def test_gate_composition_is_pinned():
    import __spark_entry__ as m

    qs = list(m.queries())
    assert qs[:50] == GATE_50, (
        "driver-gate composition changed — if deliberate, update GATE_50 "
        "in the same commit"
    )
    # every registered query has an oracle (weaker rows-only checks are a
    # conscious omission, currently none)
    osql = m.oracle_sql()
    assert [k for k in qs if k not in osql] == []
    assert len(qs) == len(set(qs)) == 129


def test_docstring_query_count_matches_registry():
    """The module docstring's stated query count drifted three rounds in a
    row ("95", "98" while 104 were registered) — pin it mechanically."""
    import re

    import __spark_entry__ as m

    match = re.search(r"(\d+)\s*\nqueries total", m.__doc__)
    assert match, "docstring must state '<N> queries total'"
    assert int(match.group(1)) == len(m.queries()), (
        "docstring query count is stale — update it alongside the registry"
    )
