"""Relational operator inventory vs the DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from incresql_spark.operators import relational

from .conftest import SF_SMALL
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, relational.QUERIES[name], relational.ORACLE[name], SF_SMALL
    )


def test_semi_join_plan_has_no_payload_shuffle(spark):
    """left_semi should not carry order payload columns through the join."""
    plan = (
        relational.op_semi_anti_join(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "LeftAnti" in plan


def _py_bpe(vocab, n):
    """Pure-Python Sennrich get_stats/merge_vocab reference (count desc /
    pair asc tie-break, left-to-right non-overlapping merges)."""
    words = {tuple(w): f for w, f in vocab.items()}
    out = []
    for rank in range(1, n + 1):
        stats = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] = (
                    stats.get((syms[i], syms[i + 1]), 0) + f
                )
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        out.append((rank, f"#{a} #{b}", a + b, cnt))
        new_words = {}
        for syms, f in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_words[tuple(merged)] = new_words.get(tuple(merged), 0) + f
        words = new_words
    return out


def test_bpe_merges_match_python_reference(spark):
    """bpe_merges_from_words must reproduce the classic Sennrich loop on a
    handcrafted vocabulary that exercises overlap ('aaaa') and
    second-order merges."""
    from incresql_spark.operators.text import bpe_merges_from_words

    vocab = {"aaaa": 3, "aab": 2, "banana": 2, "bandana": 1}
    py_bpe = _py_bpe

    words_df = spark.createDataFrame(
        list(vocab.items()), "token string, wfreq long"
    )
    got = [
        (r.merge_rank, r.pair, r.merged, r.pair_count)
        for r in bpe_merges_from_words(words_df, 6).orderBy("merge_rank").collect()
    ]
    assert got == py_bpe(vocab, 6)


def test_bpe_deep_merge_loop_bounded(spark):
    """n_merges past BPE_CHECKPOINT_EVERY must stay correct (vs the Python
    reference) AND bounded: the loop materializes + releases its state
    every 16 merges, so plan depth doesn't grow O(n²) and no persisted
    blocks (base cache or checkpoints) survive the call."""
    import random

    from incresql_spark.operators.text import bpe_merges_from_words

    rng = random.Random(7)
    vocab = {}
    while len(vocab) < 300:
        w = "".join(
            rng.choice("abcdefgh") for _ in range(rng.randint(6, 12))
        )
        vocab.setdefault(w, rng.randint(1, 9))
    words_df = spark.createDataFrame(
        list(vocab.items()), "token string, wfreq long"
    )
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    got = [
        (r.merge_rank, r.pair, r.merged, r.pair_count)
        for r in bpe_merges_from_words(words_df, 32)
        .orderBy("merge_rank")
        .collect()
    ]
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert got == _py_bpe(vocab, 32)
    assert len(got) == 32
    assert after <= before, "BPE loop leaked persisted state"


def test_bpe_tokenize_consumes_pretrained_merges(spark):
    """text_bpe_tokenize(merges=...) must apply a PRE-TRAINED merge table
    (zero training jobs in the apply pass) and match the self-training
    path row-for-row."""
    from incresql_spark.operators.text import text_bpe_merges, text_bpe_tokenize

    merges = text_bpe_merges(spark, SF_SMALL)
    trained = sorted(map(tuple, text_bpe_tokenize(spark, SF_SMALL).collect()))
    applied = sorted(
        map(tuple, text_bpe_tokenize(spark, SF_SMALL, merges=merges).collect())
    )
    assert trained == applied
