"""Non-ASCII fixture for the byte-gram operators (round-6 verdict task 6).

text_lm_score and dedup_substring_winnow slice UTF-8 BYTES on the Spark
side (the O(1)-offset fix for the quadratic codepoint-seek trap).  Their
DuckDB oracles used VARCHAR substr, which coincides only on ASCII — this
fixture would have hash-diverged.  Both oracles are now byte-faithful via
``substr(hex(encode(..)))`` (byte offsets doubled over an ASCII hex
string), and this test pins that contract on genuinely multibyte text:
accented Latin (2-byte), Greek/Cyrillic (2-byte), CJK (3-byte), and emoji
(4-byte) sequences, mixed with ASCII and repeated so winnow finds pairs.
"""

from __future__ import annotations

import duckdb

from tests.oracle import normalize


def _multibyte_docs(spark, tmp_path) -> str:
    # long enough for winnow (>= WINNOW_K + WINNOW_W - 1 = 29 chars) and
    # containing shared multibyte substrings across docs so pairs emerge
    base = [
        "héllo wörld — çafé naïve résumé über straße garçon fiancée déjà vu",
        "καλημέρα κόσμε ελληνικά γράμματα δοκιμή κείμενο παράδειγμα γλώσσα",
        "привет мир это тест русского текста для проверки байтовых триграмм",
        "日本語のテキストです。バイト単位のトライグラムを検証します。漢字かな交じり文",
        "emoji test 🚀🚀🚀 four-byte sequences 🎉 mixed with ascii text here 🌍",
        "plain ascii control document with twenty nine plus characters total",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, f"src{i % 2}", t + " shared-multibyte-tail ✓✓✓"))
        # a near-duplicate sharing a long substring → winnow must pair them
        rows.append((100 + i, f"src{i % 2}", t + " shared-multibyte-tail ✗✗✗"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sf_dir = str(tmp_path / "mb")
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _check(spark, sf_dir, query_fn, sql):
    con = duckdb.connect()
    con.execute(
        # Spark writes the table as a directory of part files
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    sdf = query_fn(spark, sf_dir)
    rel = con.sql(sql)
    a = normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    b = normalize(rel.columns, [tuple(r) for r in rel.fetchall()])
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(a) == len(b) > 0, (len(a), len(b))
    assert a == b
    con.close()
    return len(a)


def test_lm_score_byte_faithful_on_multibyte(spark, tmp_path):
    from incresql_spark.operators.text import TEXT_LM_SCORE_SQL, text_lm_score

    n = _check(spark, _multibyte_docs(spark, tmp_path), text_lm_score,
               TEXT_LM_SCORE_SQL)
    assert n == 12  # every doc scored


def test_winnow_byte_faithful_on_multibyte(spark, tmp_path):
    from incresql_spark.operators.dedup import (
        DEDUP_SUBSTRING_WINNOW_SQL,
        dedup_substring_winnow,
    )

    n = _check(spark, _multibyte_docs(spark, tmp_path), dedup_substring_winnow,
               DEDUP_SUBSTRING_WINNOW_SQL)
    assert n >= 6  # each doc pairs with its near-duplicate


def test_dsir_byte_faithful_on_multibyte(spark, tmp_path):
    from incresql_spark.operators.text import (
        TEXT_DSIR_SELECT_SQL,
        text_dsir_select,
    )

    # doc_ids < DSIR_TARGET_MAX_DOC (20) play the target set — the fixture
    # builder's 0..5 base docs land there, the 100.. near-dups are scored
    n = _check(spark, _multibyte_docs(spark, tmp_path), text_dsir_select,
               TEXT_DSIR_SELECT_SQL)
    assert n == 6  # the six candidate (non-target) docs scored
