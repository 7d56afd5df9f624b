"""JSONL source/sink: round-trip, explicit schema, corrupt-line quarantine,
recursive directory layout."""

from __future__ import annotations

from incresql_spark.sources.jsonl import read_jsonl, write_jsonl

from .conftest import SF_SMALL

SCHEMA = "doc_id LONG, text STRING, lang STRING"


def test_jsonl_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, SCHEMA)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    a = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    b = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    assert a == b


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    d = tmp_path / "in" / "date=2024-01-01"
    d.mkdir(parents=True)
    (d / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de"}\n'
    )
    clean = read_jsonl(spark, str(tmp_path / "in"), SCHEMA)
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]

    kept = read_jsonl(spark, str(tmp_path / "in"), SCHEMA, keep_corrupt=True)
    bad = [r for r in kept.collect() if r._corrupt_record is not None]
    assert len(bad) == 1 and "NOT JSON" in bad[0]._corrupt_record
