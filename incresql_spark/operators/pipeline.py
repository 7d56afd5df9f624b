"""End-to-end corpus curation — the composed dataflow a training-data
pipeline actually runs, as ONE Catalyst plan:

    quality filter → exact-dedup keeper selection → decontamination
    (eval-set shingle overlap) → per-language token rollup

Each stage reuses the building blocks the standalone operators are built
from (``text`` token/stopword expressions, ``dedup`` shingles and the
eval-set convention), so this is the integration query over them — the
driver gate checks the whole composition value-exactly.

Scale shape (the reason each stage looks the way it does):
- quality filter: narrow map, no shuffle, evaluated at the scan;
- keeper selection: one shuffle on the 16-byte content hash (only hash +
  doc_id + the rollup columns travel, never the text);
- decontamination: eval-side shingles are tiny → broadcast; the train
  corpus streams past in one pass (no corpus-side shuffle before the
  per-doc aggregate);
- rollup: partial aggregation into a per-language final — output rows =
  |languages|.

Output is all BIGINT counts (hash-stable on any engine build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import _DOC_SHINGLES_DUCK, _doc_shingles, EVAL_SET_MAX_DOC
from .text import STOPWORDS, TOKENS_DUCK, TOKENS_SPARK, _sql_list

#: quality gate: floor on token count and on the stopword (fluency) ratio
CURATE_MIN_TOKENS = 20
CURATE_MIN_STOPWORD_RATIO = 0.02
#: exclude a train doc when it shares at least this many distinct shingles
#: with any eval-set document
CURATE_CONTAM_SHINGLES = 3


def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-corpus rollup: (lang, n_docs, total_tokens) after quality,
    dedup-keeper and decontamination passes."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.withColumn("tokens", F.expr(TOKENS_SPARK)).withColumn(
        "n_tokens", F.size("tokens")
    )
    stop_cnt = F.expr(
        f"size(filter(tokens, t -> t IN ({_sql_list(STOPWORDS)})))"
    )
    quality = toks.filter(
        (F.col("doc_id") >= EVAL_SET_MAX_DOC)
        & (F.col("n_tokens") >= CURATE_MIN_TOKENS)
        # integer-exact form of stop/total >= RATIO (no float division)
        & (
            stop_cnt * int(round(1 / CURATE_MIN_STOPWORD_RATIO))
            >= F.col("n_tokens")
        )
    )
    # keeper = min doc_id within each exact-content group
    w = Window.partitionBy(F.md5("text"))
    keepers = (
        quality.withColumn("keeper", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "lang", "n_tokens")
    )
    docsh = _doc_shingles(spark, sf_dir)
    ev = docsh.filter(F.col("doc_id") < EVAL_SET_MAX_DOC).select(
        F.col("doc_id").alias("eval_doc_id"), F.explode("shingles").alias("shingle")
    )
    tr = docsh.filter(F.col("doc_id") >= EVAL_SET_MAX_DOC).select(
        F.col("doc_id").alias("train_doc_id"), F.explode("shingles").alias("shingle")
    )
    contaminated = (
        tr.join(F.broadcast(ev), ["shingle"])
        .groupBy("train_doc_id")
        .agg(F.countDistinct("shingle").alias("n_common"))
        .filter(F.col("n_common") >= CURATE_CONTAM_SHINGLES)
        .select(F.col("train_doc_id").alias("doc_id"))
    )
    clean = keepers.join(contaminated, ["doc_id"], "left_anti")
    return (
        clean.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("lang")
    )


PIPELINE_CURATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, text, {TOKENS_DUCK} AS tokens
  FROM documents
),
quality AS (
  SELECT doc_id, lang, text, len(tokens) AS n_tokens
  FROM toks
  WHERE doc_id >= {EVAL_SET_MAX_DOC}
    AND len(tokens) >= {CURATE_MIN_TOKENS}
    AND len(list_filter(tokens, t -> t IN ({_sql_list(STOPWORDS)})))
        * {int(round(1 / CURATE_MIN_STOPWORD_RATIO))} >= len(tokens)
),
keepers AS (
  SELECT doc_id, lang, n_tokens
  FROM (
    SELECT doc_id, lang, n_tokens,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
    FROM quality
  ) k
  WHERE doc_id = keeper
),
docsh AS ({_DOC_SHINGLES_DUCK}),
ev AS (
  SELECT doc_id AS eval_doc_id, unnest(shingles) AS shingle
  FROM docsh WHERE doc_id < {EVAL_SET_MAX_DOC}
),
tr AS (
  SELECT doc_id AS train_doc_id, unnest(shingles) AS shingle
  FROM docsh WHERE doc_id >= {EVAL_SET_MAX_DOC}
),
contaminated AS (
  SELECT train_doc_id AS doc_id
  FROM tr t JOIN ev e USING (shingle)
  GROUP BY train_doc_id
  HAVING count(DISTINCT t.shingle) >= {CURATE_CONTAM_SHINGLES}
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM keepers k
WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = k.doc_id)
GROUP BY lang
ORDER BY lang
"""

QUERIES = {"pipeline_curate": pipeline_curate}
ORACLE = {"pipeline_curate": PIPELINE_CURATE_SQL}
