"""Text-analysis operators over the ``documents`` table — the language-ID /
quality-scoring / token-counting / fingerprinting stage of a training-data
pipeline (BASELINE.json north star; beyond the reference's own surface).

All operators are built from Column expressions (JVM-side, whole-stage
codegen, no Python) and oracle-matched against DuckDB.  The shared token
convention is ``regexp_extract_all(lower(text), '[a-z0-9]+')`` — identical
semantics in both engines for ASCII input.  Beyond the per-doc scorers
(stats, langid, tokens, fingerprint, repetition, OOV, PII scrub), the
module covers corpus-level preparation: vocabulary (``text_vocab``),
stratified sampling, token-budget source mixing (``text_mix_sources``),
concat-and-chunk sequence packing (``text_pack_sequences``), and
overlapping retrieval chunking (``text_chunk_overlap``).

Scale: the per-doc scorers are narrow maps — no shuffle except the final
ORDER BY (test determinism only).  The corpus-level ops confine their
shuffles to tiny aggregate frames (per-source rates, per-shard prefix
offsets) broadcast back against narrow passes; the corpus itself shuffles
at most once.  At 100 TB this is the ideal shape: scan → project → write,
fully pipelined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import hash60, hash60_spark_sql, hash60_sql
from ..plans import layout

TOKENS_SPARK = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
TOKENS_DUCK = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# Stopword list used by the quality score (count of function words is a
# classic cheap fluency proxy).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Marker words per language for the n-gram/stopword language-ID heuristic.
# The corpus is synthetic, so markers are drawn from its vocabulary; the
# mechanism (per-language marker counting + argmax) is the real deliverable.
LANG_MARKERS = {
    "en": ("the", "fast", "order", "scan"),
    "de": ("und", "der", "das", "merge"),
    "es": ("el", "la", "los", "stream"),
}


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / token / punctuation / stopword features and
    a composite quality score.  Everything derives from one tokens array.

    Expression choices are measured (tiled sf10, 500k docs): the
    sum-of-token-lengths comes from ``length(concat_ws('', tokens))``
    instead of an ``aggregate`` lambda (interpreted, ~4x the cost), and the
    alphanumeric character count reuses that same concat (CSE) plus a
    single-char ``translate`` space count instead of a character-class
    ``regexp_replace`` (the single most expensive expression in the old
    plan; ``regexp_count`` is even worse, measured 13x slower than the
    replace).  Values are bit-identical to the regex formulation — the
    DuckDB oracle still spells it with regexp_replace and hashes equal.
    """
    d = load_table(spark, sf_dir, "documents")
    # alnum chars == sum of token lengths over lower(text): every
    # [a-zA-Z0-9] char of text lands in exactly one [a-z0-9]+ token.
    sum_tok_len = F.length(F.concat_ws("", F.col("tokens")))
    space_cnt = F.length("text") - F.length(F.translate(F.col("text"), " ", ""))
    return (
        d.withColumn("tokens", F.expr(TOKENS_SPARK))
        .select(
            "doc_id",
            "lang",
            F.length("text").alias("len_chars"),
            F.size("tokens").alias("n_tokens"),
            F.size(F.array_distinct("tokens")).alias("n_unique_tokens"),
            (
                sum_tok_len.cast("double") / F.size("tokens").cast("double")
            ).alias("avg_token_len"),
            (
                (sum_tok_len + space_cnt).cast("double")
                / F.length("text").cast("double")
            ).alias("alnum_space_ratio"),
            (
                F.expr(
                    f"size(filter(tokens, t -> t IN ({_sql_list(STOPWORDS)})))"
                ).cast("double")
                / F.size("tokens").cast("double")
            ).alias("stopword_ratio"),
            (
                F.size(F.array_distinct("tokens")).cast("double")
                / F.size("tokens").cast("double")
            ).alias("ttr"),
        )
        .orderBy("doc_id")
    )


TEXT_STATS_SQL = f"""
SELECT doc_id,
       lang,
       length(text)                                               AS len_chars,
       len(tokens)                                                AS n_tokens,
       len(list_distinct(tokens))                                 AS n_unique_tokens,
       CAST(list_reduce(list_transform(tokens, t -> length(t)), (a, b) -> a + b) AS DOUBLE)
         / CAST(len(tokens) AS DOUBLE)                            AS avg_token_len,
       CAST(length(text) - length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         / CAST(length(text) AS DOUBLE)                           AS alnum_space_ratio,
       CAST(len(list_filter(tokens, t -> t IN ({_sql_list(STOPWORDS)}))) AS DOUBLE)
         / CAST(len(tokens) AS DOUBLE)                            AS stopword_ratio,
       CAST(len(list_distinct(tokens)) AS DOUBLE)
         / CAST(len(tokens) AS DOUBLE)                            AS ttr
FROM (SELECT doc_id, lang, text, {TOKENS_DUCK} AS tokens FROM documents) t
ORDER BY doc_id
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by marker-word counting + deterministic argmax."""
    d = load_table(spark, sf_dir, "documents")
    df = d.withColumn("tokens", F.expr(TOKENS_SPARK))
    for lang, markers in LANG_MARKERS.items():
        df = df.withColumn(
            f"score_{lang}",
            F.expr(f"size(filter(tokens, t -> t IN ({_sql_list(markers)})))"),
        )
    predicted = (
        F.when(
            (F.col("score_en") >= F.col("score_de")) & (F.col("score_en") >= F.col("score_es")),
            F.lit("en"),
        )
        .when(F.col("score_de") >= F.col("score_es"), F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return (
        df.select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.col("score_en"),
            F.col("score_de"),
            F.col("score_es"),
            predicted.alias("predicted_lang"),
        )
        .orderBy("doc_id")
    )


TEXT_LANGID_SQL = f"""
SELECT doc_id,
       lang AS true_lang,
       score_en,
       score_de,
       score_es,
       CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
            WHEN score_de >= score_es THEN 'de'
            ELSE 'es' END AS predicted_lang
FROM (
  SELECT doc_id, lang,
         len(list_filter(tokens, t -> t IN ({_sql_list(LANG_MARKERS["en"])}))) AS score_en,
         len(list_filter(tokens, t -> t IN ({_sql_list(LANG_MARKERS["de"])}))) AS score_de,
         len(list_filter(tokens, t -> t IN ({_sql_list(LANG_MARKERS["es"])}))) AS score_es
  FROM (SELECT doc_id, lang, {TOKENS_DUCK} AS tokens FROM documents) t
) s
ORDER BY doc_id
"""


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword count
    (greedy ≤4-char alnum pieces — a deterministic proxy for byte-pair
    piece counts usable for corpus token-budget estimates)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(F.expr("regexp_extract_all(text, '\\\\S+', 0)")).alias("n_ws_tokens"),
            F.size(F.expr(TOKENS_SPARK)).alias("n_word_tokens"),
            F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]{1,4}', 0)")).alias(
                "n_bpe_pieces"
            ),
            (F.length("text").cast("double") / F.size(F.expr(TOKENS_SPARK)).cast("double")).alias(
                "chars_per_token"
            ),
        )
        .orderBy("doc_id")
    )


TEXT_TOKENS_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+'))                     AS n_ws_tokens,
       len({TOKENS_DUCK})                                        AS n_word_tokens,
       len(regexp_extract_all(lower(text), '[a-z0-9]{{1,4}}'))   AS n_bpe_pieces,
       CAST(length(text) AS DOUBLE) / CAST(len({TOKENS_DUCK}) AS DOUBLE) AS chars_per_token
FROM documents
ORDER BY doc_id
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: OpenRefine-style key (md5 of sorted distinct
    tokens — whitespace/case/order-insensitive) + raw-content md5."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5("text").alias("content_hash"),
            F.md5(
                F.concat_ws(" ", F.array_sort(F.array_distinct(F.expr(TOKENS_SPARK))))
            ).alias("fingerprint"),
        )
        .orderBy("doc_id")
    )


TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(text) AS content_hash,
       md5(array_to_string(list_sort(list_distinct({TOKENS_DUCK})), ' ')) AS fingerprint
FROM documents
ORDER BY doc_id
"""


# PII redaction — the standard curation stage between quality scoring and
# packing (C4 strips lines with bad-words/PII markers; CCNet and Dolma run
# regex redaction passes; RefinedWeb masks emails/phones/IPs).  Three
# deterministic regex classes — email, phone (NANP-ish with optional
# country/area prefix), IPv4 — applied as a SEQUENTIAL scrub chain with the
# per-class count taken on the text state that class actually sees, exactly
# as a production redaction pipeline composes.  The patterns use only the
# RE2 ∩ Java regex subset (character classes, bounded repetition, optional
# non-backreferenced groups, \\b — no lookaround, no backreferences) so the
# Spark and DuckDB engines match byte-for-byte; replacements contain no
# ``$``/``\\`` so neither engine's backreference syntax triggers.  The
# corpus is synthetic (zero digits, zero '@'), so the query grafts
# deterministic PII spans derived from doc_id — identical expressions both
# engines; docs land in different class mixes (none / one / several per
# class) so zero-count and multi-count paths are all exercised.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "(\\+[0-9]{1,2} )?(\\([0-9]{3}\\)[- ]?|[0-9]{3}[- ])?[0-9]{3}-[0-9]{4}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

# doc_id-derived PII grafts (mod-3 class rotation, mod-5 multi-class rider).
_PII_GRAFT_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', doc_id,"
    "   '@example.com now') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 1 THEN concat(' call +1 (415) 555-',"
    "   lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' soon') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 2 THEN concat(' host 10.', doc_id % 256, '.',"
    "   (doc_id DIV 7) % 256, '.', doc_id % 254 + 1, ' up') ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' cc admin.', doc_id,"
    "   '@test.org and 192.168.', doc_id % 256, '.1 also 555-',"
    "   lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END)"
)
_PII_GRAFT_DUCK = (
    "text ||"
    " CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id ||"
    "   '@example.com now' ELSE '' END ||"
    " CASE WHEN doc_id % 3 = 1 THEN ' call +1 (415) 555-' ||"
    "   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' soon' ELSE '' END ||"
    " CASE WHEN doc_id % 3 = 2 THEN ' host 10.' || doc_id % 256 || '.' ||"
    "   (doc_id // 7) % 256 || '.' || (doc_id % 254 + 1) || ' up' ELSE '' END ||"
    " CASE WHEN doc_id % 5 = 0 THEN ' cc admin.' || doc_id ||"
    "   '@test.org and 192.168.' || doc_id % 256 || '.1 also 555-' ||"
    "   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails → phones → IPv4s in sequence; emit the redacted text
    plus per-class counts (each count taken on the intermediate text its
    class scrubs, mirroring the production chain).  Pure Column
    expressions: a narrow codegen'd map, no Python and no shuffle in the
    path — the shape survives any corpus size unchanged."""
    d = load_table(spark, sf_dir, "documents")
    pii = d.select("doc_id", F.expr(_PII_GRAFT_SPARK).alias("pii_text"))
    t1 = F.regexp_replace(F.col("pii_text"), EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, PHONE_RE, "<PHONE>")
    t3 = F.regexp_replace(t2, IPV4_RE, "<IP>")
    return pii.select(
        "doc_id",
        F.regexp_count(F.col("pii_text"), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t1, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(t2, F.lit(IPV4_RE)).alias("n_ips"),
        t3.alias("scrubbed"),
    ).orderBy("doc_id")


TEXT_PII_SCRUB_SQL = f"""
WITH pii AS (
  SELECT doc_id, {_PII_GRAFT_DUCK} AS pii_text FROM documents
),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(pii_text, '{EMAIL_RE}')) AS INT)
           AS n_emails,
         regexp_replace(pii_text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM pii
),
s2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t1, '{PHONE_RE}')) AS INT) AS n_phones,
         regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g') AS t2
  FROM s1
)
SELECT doc_id, n_emails, n_phones,
       CAST(len(regexp_extract_all(t2, '{IPV4_RE}')) AS INT) AS n_ips,
       regexp_replace(t2, '{IPV4_RE}', '<IP>', 'g') AS scrubbed
FROM s2
ORDER BY doc_id
"""


# Boilerplate removal — C4's line-level cleaning rules (Raffel et al.,
# arXiv:1910.10683 §2.2): keep only lines that (a) end in terminal
# punctuation, (b) have at least BOILER_MIN_WORDS words, and (c) contain
# none of the boilerplate blocklist phrases (cookie notices, javascript
# warnings, lorem ipsum, rights-reserved footers).  Documents with at
# least one token whose every line is dropped are emptied (cleaned = '')
# rather than removed — the caller composes the doc-level drop; ZERO-token
# documents are excluded by the harness up front (they have no lines to
# classify), identically on both engines.  The synthetic corpus is
# single-line prose with no punctuation, so the query builds lines
# deterministically — token slices of BOILER_LINE_TOKENS words, terminal
# '.' grafted onto (doc_id + pos) % 3 = 0 lines, and doc_id-rotated
# boilerplate lines appended — identical expressions both engines; every
# rule then has both keep and drop exemplars in every run.  The nav-bar
# graft is EXEMPT from the punctuation graft (round-12 advice): it exists
# to exercise the punctuation-only drop rule, which a grafted '.' would
# defeat for (pos + doc_id) % 3 = 0 docs.
BOILER_LINE_TOKENS = 8
BOILER_MIN_WORDS = 4
BOILER_BLOCKLIST = ("cookie", "javascript", "lorem ipsum", "rights reserved")
#: grafted boilerplate exemplars: each is dropped by a DIFFERENT rule —
#: blocklist-only (punct + enough words), blocklist + min-words, and
#: punctuation-only (a nav bar: enough words, no blocklist hit).
_BOILER_GRAFTS = (
    "please accept cookies to continue browsing here.",
    "all rights reserved.",
    "home | about | contact | privacy",
)


def _boiler_keep(line):
    """The C4 §2.2 line-keep predicate as a Column over ``line``:
    terminal punctuation AND ≥ BOILER_MIN_WORDS words AND no blocklist
    phrase.  Shared by the production ``clean_lines`` core and the
    synthetic gate harness so the classifier cannot drift between them."""
    blocked = None
    for phrase in BOILER_BLOCKLIST:
        hit = line.contains(phrase)
        blocked = hit if blocked is None else (blocked | hit)
    return (
        F.substring(line, -1, 1).isin(".", "!", "?")
        & (F.size(F.split(line, " ")) >= BOILER_MIN_WORDS)
        & ~blocked
    )


def clean_lines(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Reusable C4 line-level cleaner over REAL newline-delimited text
    (Raffel et al., arXiv:1910.10683 §2.2): split ``text_col`` on '\\n',
    classify every line with :func:`_boiler_keep`, and reassemble the
    kept lines in document order.  Emits one row per input row —
    ``(id_col, n_lines, n_kept, cleaned)`` — with all-dropped and empty
    documents EMPTIED (``cleaned = ''``, ``n_kept = 0``) rather than
    removed, so the caller composes any doc-level drop policy.

    Shape: one Generate (the posexplode) and one hash exchange (the
    ``id_col``-keyed reassembly aggregation); per-group state is bounded
    by document size, so the plan holds at any corpus scale.  The gate
    query ``text_boilerplate`` routes its synthetic corpus through this
    exact function (round-12 advice: the rule core must be reachable
    without the graft scaffolding)."""
    lines = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    return (
        lines.withColumn("keep", _boiler_keep(F.col("line")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("keep").cast("int")).alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.filter(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "keep", "line"))
                        ),
                        lambda s: s["keep"],
                    ),
                    lambda s: s["line"],
                ),
            ).alias("cleaned"),
        )
    )


def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level boilerplate filter over the synthetic corpus: build
    the deterministic multi-line document (token-slice lines, rotated
    boilerplate grafts, punctuation grafting) as ONE narrow projection,
    then run the production :func:`clean_lines` core on it.  One explode
    and one groupBy(doc_id) — the reassembly aggregation is the only
    shuffle, partitioned by doc_id, and per-group state is bounded by
    document size (the same envelope every per-doc operator here lives
    in), so the shape holds at any corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    n_lines_expr = (
        f"CAST(ceil(size(tokens) / {BOILER_LINE_TOKENS}.0) AS INT)"
    )
    lines_expr = (
        f"transform(sequence(0, {n_lines_expr} - 1),"
        f" i -> array_join(slice(tokens, i * {BOILER_LINE_TOKENS} + 1,"
        f" {BOILER_LINE_TOKENS}), ' '))"
    )
    grafts = ", ".join(f"'{g}'" for g in _BOILER_GRAFTS)
    # graft terminal punctuation onto a deterministic subset so the
    # punctuation rule differentiates (the synthetic prose has none);
    # the nav-bar exemplar is exempt — it must stay punctuation-free
    # to exercise the punctuation-only drop rule
    punctuated = (
        f"transform(lines, (line, pos) -> "
        f"IF((pos + doc_id) % 3 = 0 AND line <> '{_BOILER_GRAFTS[2]}',"
        f" concat(line, '.'), line))"
    )
    synthetic = (
        d.withColumn("tokens", F.expr(TOKENS_SPARK))
        .filter(F.size("tokens") >= 1)
        .select(
            "doc_id",
            F.concat(
                F.expr(lines_expr),
                # rotate which boilerplate exemplars each doc receives
                F.expr(
                    f"slice(array({grafts}), CAST(doc_id % 3 AS INT) + 1, 2)"
                ),
            ).alias("lines"),
        )
        .select(
            "doc_id",
            F.array_join(F.expr(punctuated), "\n").alias("text"),
        )
    )
    return clean_lines(synthetic).orderBy("doc_id")


def _boiler_keep_duck() -> str:
    blocked = " OR ".join(
        f"contains(line, '{p}')" for p in BOILER_BLOCKLIST
    )
    return (
        f"right(line, 1) IN ('.', '!', '?')"
        f" AND len(string_split(line, ' ')) >= {BOILER_MIN_WORDS}"
        f" AND NOT ({blocked})"
    )


TEXT_BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {TOKENS_DUCK} AS tokens FROM documents
),
linesets AS (
  SELECT doc_id,
         list_concat(
           list_transform(
             range(0, CAST(ceil(len(tokens) / {BOILER_LINE_TOKENS}.0) AS INT)),
             i -> array_to_string(
               list_slice(tokens, i * {BOILER_LINE_TOKENS} + 1,
                          i * {BOILER_LINE_TOKENS} + {BOILER_LINE_TOKENS}),
               ' ')),
           list_slice(
             [{", ".join(f"'{g}'" for g in _BOILER_GRAFTS)}],
             CAST(doc_id % 3 AS INT) + 1, CAST(doc_id % 3 AS INT) + 2)
         ) AS lines
  FROM toks WHERE len(tokens) >= 1
),
pos_lines AS (
  -- parallel unnests zip positionally (the TEXT_REPETITION_SQL pattern;
  -- DuckDB lacks WITH ORDINALITY)
  SELECT doc_id,
         unnest(range(0, len(lines))) AS rawpos,
         unnest(lines) AS rawline
  FROM linesets
),
punctuated AS (
  SELECT doc_id, rawpos AS pos,
         CASE WHEN (rawpos + doc_id) % 3 = 0
                   AND rawline <> '{_BOILER_GRAFTS[2]}'
              THEN rawline || '.'
              ELSE rawline END AS line
  FROM pos_lines
),
classified AS (
  SELECT doc_id, pos, line, ({_boiler_keep_duck()}) AS keep
  FROM punctuated
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_kept,
       coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
                           ORDER BY pos), '') AS cleaned
FROM classified
GROUP BY doc_id
ORDER BY doc_id
"""


# Stratified sampling: per-language keep rates (per-10000 thresholds) — the
# training-mix design step.  Hash-thresholding (not rand()) so the sample is
# deterministic, reproducible, and identical on any cluster size.
STRATA_BP = {"en": 5000, "de": 2500, "es": 1000, "fr": 1000, "zh": 500}
DEFAULT_BP = 100
_SAMPLE_SEED = "strat"


def text_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each doc iff hash60(seed|doc_id) mod 10000 < its language's
    threshold.  A narrow filter — no shuffle, no state, any scale; rates are
    exact in expectation and the choice is stable under reruns/backfills."""
    from ..functions.hashing import hash60

    d = load_table(spark, sf_dir, "documents")
    h = hash60(F.concat(F.col("doc_id").cast("string")), seed=_SAMPLE_SEED)
    threshold = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(bp))
            for lang, bp in STRATA_BP.items()
        ],
        F.lit(DEFAULT_BP),
    )
    return (
        d.filter((h % 10000) < threshold)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _strata_case_duck() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in STRATA_BP.items()
    )
    return f"CASE lang {whens} ELSE {DEFAULT_BP} END"


def _sample_sql() -> str:
    from ..functions.hashing import hash60_sql

    h = hash60_sql("CAST(doc_id AS VARCHAR)", seed=_SAMPLE_SEED)
    return f"""
SELECT doc_id, lang
FROM documents
WHERE {h} % 10000 < {_strata_case_duck()}
ORDER BY doc_id
"""


TEXT_SAMPLE_STRATIFIED_SQL = _sample_sql()


_TEMP_SEED = "temp"


def text_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced language sampling — the mT5/XLM-R recipe
    (Xue et al., arXiv:2010.11934 §3.1): sample language l with
    probability ∝ n_l^α so low-resource languages are up-sampled relative
    to their corpus share.  α = 0.5 here, i.e. weights √n_l.

    Exact-arithmetic form (the cross-engine-verifiability price): the only
    float op is ``sqrt`` — IEEE 754 requires it correctly rounded, so both
    engines produce the bit-identical double — immediately quantized to an
    integer weight ``w_l = floor(1e6·√n_l)``; every subsequent step (the
    weight sum, the per-language target ``(S·w_l) DIV Σw``, the keep
    threshold ``min(1e6, 1e6·target DIV n_l)``, the hash-gated selection)
    is BIGINT arithmetic, so no float ACCUMULATION ever happens and
    summation order cannot perturb the result.  Budget S = half the
    corpus.  Selection is the stratified operator's stable hash gate
    (``hash60(seed|doc_id) mod 1e6 < thr``) — deterministic under reruns
    and backfills.

    Output: one row per language (n_docs, the ppm keep threshold, and the
    selected count) — small languages carry visibly higher thresholds.

    Scale: two scans of ``documents`` with map-side partial aggregation
    (per-language counts, then per-language selected counts), each
    shuffling only #languages×partitions partial rows; the threshold
    table (#languages rows) broadcasts back.  No floats cross machine
    boundaries.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    wall = Window.partitionBy()
    t = (
        counts.withColumn(
            "w",
            F.expr(
                "CAST(FLOOR(CAST(1000000 AS DOUBLE) "
                "* SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)"
            ),
        )
        .withColumn("sum_w", F.sum("w").over(wall))
        .withColumn("total", F.sum("n_docs").over(wall))
        .withColumn("target", F.expr("((total DIV 2) * w) DIV sum_w"))
        .withColumn(
            "thr_ppm",
            F.expr(
                "LEAST(CAST(1000000 AS BIGINT), (1000000 * target) DIV n_docs)"
            ),
        )
    )
    h = hash60(F.col("doc_id").cast("string"), seed=_TEMP_SEED)
    sel = d.join(F.broadcast(t.select("lang", "n_docs", "thr_ppm")), "lang")
    return (
        sel.groupBy("lang")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("thr_ppm").alias("thr_ppm"),
            F.sum(((h % 1000000) < F.col("thr_ppm")).cast("bigint")).alias(
                "n_selected"
            ),
        )
        .orderBy("lang")
    )


def _sample_temperature_sql() -> str:
    h = hash60_sql("CAST(doc_id AS VARCHAR)", seed=_TEMP_SEED)
    return f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
t AS (
  SELECT lang, n_docs,
         CAST(floor(CAST(1000000 AS DOUBLE)
              * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w,
         CAST(SUM(CAST(floor(CAST(1000000 AS DOUBLE)
              * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)) OVER () AS BIGINT) AS sum_w,
         CAST(SUM(n_docs) OVER () AS BIGINT) AS total
  FROM counts
),
thr AS (
  SELECT lang, n_docs,
         CAST(LEAST(CAST(1000000 AS BIGINT),
               (1000000 * (((total // 2) * w) // sum_w)) // n_docs) AS BIGINT) AS thr_ppm
  FROM t
)
SELECT d.lang,
       MAX(thr.n_docs) AS n_docs,
       MAX(thr.thr_ppm) AS thr_ppm,
       CAST(SUM(CASE WHEN {h} % 1000000 < thr.thr_ppm
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
FROM documents d JOIN thr USING (lang)
GROUP BY d.lang
ORDER BY d.lang
"""


TEXT_SAMPLE_TEMPERATURE_SQL = _sample_temperature_sql()


VOCAB_TOP_K = 100


def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-K tokens by frequency with document counts —
    the input to tokenizer/BPE training and stopword discovery.

    explode → hash-agg → TakeOrderedAndProject: the explode multiplies rows
    ~100× but map-side partial aggregation collapses them before the single
    shuffle, and the top-K never materializes the full vocabulary on one
    node (per-partition heaps merge at the driver-bound limit only).
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(VOCAB_TOP_K)
    )


TEXT_VOCAB_SQL = f"""
SELECT token,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (SELECT doc_id, unnest({TOKENS_DUCK}) AS token FROM documents)
GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {VOCAB_TOP_K}
"""


# Keep threshold for the repetition filter: docs whose duplicate-bigram
# fraction exceeds this are low-quality boilerplate (Gopher-style
# repetition rule: heavily repeated n-grams mark machine-generated or
# templated text).
REPETITION_MAX_DUP_FRAC = 0.30


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter: duplicate word-bigram fraction.

    The classic "repeated n-grams" quality rule for training-data curation:
    a document whose bigrams are mostly repeats of each other is templated
    or degenerate text.  Computed entirely array-side (transform over the
    token array) so the operator is a narrow map — scan → project, zero
    shuffles at any scale; the ORDER BY exists only for test determinism.
    """
    d = load_table(spark, sf_dir, "documents")
    # Guard the sequence bound: sequence(0, -1) would DESCEND in Spark, so
    # docs with <2 tokens are excluded on both engines instead.
    bigrams = (
        "transform(sequence(0, size(tokens) - 2),"
        " i -> concat(tokens[i], ' ', tokens[i + 1]))"
    )
    return (
        d.withColumn("tokens", F.expr(TOKENS_SPARK))
        .filter(F.size("tokens") >= 2)
        .withColumn("bigrams", F.expr(bigrams))
        .select(
            "doc_id",
            F.size("tokens").alias("n_tokens"),
            F.size("bigrams").alias("n_bigrams"),
            F.size(F.array_distinct("bigrams")).alias("n_unique_bigrams"),
        )
        .withColumn(
            "dup_bigram_frac",
            F.lit(1.0)
            - F.col("n_unique_bigrams").cast("double")
            / F.col("n_bigrams").cast("double"),
        )
        .withColumn("keep", F.col("dup_bigram_frac") < REPETITION_MAX_DUP_FRAC)
        .orderBy("doc_id")
    )


# The oracle builds the same bigrams relationally (zip-unnest + lead window)
# because DuckDB lambdas take no index parameter; values are identical.
TEXT_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {TOKENS_DUCK} AS t FROM documents
),
pos AS (
  SELECT doc_id, len(t) AS n_tokens, unnest(t) AS tok,
         unnest(range(1, len(t) + 1)) AS p
  FROM toks WHERE len(t) >= 2
),
bg AS (
  SELECT doc_id, n_tokens,
         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY p) AS bigram
  FROM pos
),
agg AS (
  SELECT doc_id, max(n_tokens) AS n_tokens,
         count(bigram) AS n_bigrams,
         count(DISTINCT bigram) AS n_unique_bigrams
  FROM bg GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_bigrams, n_unique_bigrams,
       1.0 - CAST(n_unique_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
         AS dup_bigram_frac,
       (1.0 - CAST(n_unique_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
         < {REPETITION_MAX_DUP_FRAC} AS keep
FROM agg
ORDER BY doc_id
"""


#: vocabulary size for the OOV coverage signal — small because the
#: synthetic corpus has only ~31 distinct tokens; the mechanism (top-K
#: corpus vocab + left-anti coverage join) is the deliverable.
OOV_VOCAB_K = 16


def text_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary ratio per document against the corpus top-K vocab
    — the vocabulary-coverage quality signal (the cheap stand-in for LM
    perplexity scoring; kept log-free so both engines hash identically on
    pure integer counts and one final division).

    Scale: the vocab is a top-K aggregate (map-side partials, K rows out)
    that AQE broadcasts into the coverage join, so the only full shuffle
    is the per-doc count aggregation on doc_id.  Two-pass over tokens at
    any corpus size, no driver-side state.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("token"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(OOV_VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(vocab, "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .withColumn(
            "oov_ratio",
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        )
        .orderBy("doc_id")
    )


TEXT_OOV_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_DUCK}) AS token FROM documents
),
vocab AS (
  SELECT token FROM toks GROUP BY token
  ORDER BY count(*) DESC, token ASC LIMIT {OOV_VOCAB_K}
),
flags AS (
  SELECT t.doc_id,
         CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v USING (token)
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_ratio
FROM flags GROUP BY doc_id ORDER BY doc_id
"""


# --- Sequence packing (concat-and-chunk) -----------------------------------
PACK_CAP = 256     # tokens per training sequence (2048+ in production)
PACK_SHARD = 100   # doc_ids per prefix-sum shard


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: lay the corpus out in doc_id
    order as one token stream and cut it into fixed-capacity training
    sequences of PACK_CAP tokens; emit each document's first/last bin.
    This is the standard pretraining packing (concatenate, split at
    max_len, documents may span bins).

    The global running token offset is a distributed two-level prefix sum —
    the only scalable shape for a 100 TB cumsum: per-shard window cumsum
    (shard = doc_id DIV {SH}, each shard sorts locally), per-shard totals
    offset by a window over the tiny shard list (O(#shards) rows, broadcast
    back).  A single global ``Window.orderBy(doc_id)`` would serialize the
    corpus through one task.  The oracle uses DuckDB's global window — same
    values, single-node shape.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.size(F.expr(TOKENS_SPARK)).alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("shard", F.expr(f"doc_id DIV {PACK_SHARD}"))
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = tok.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    w_sh = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        tok.groupBy("shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .withColumn("off", F.coalesce(F.sum("shard_tokens").over(w_sh), F.lit(0)))
        .select("shard", "off")
    )
    return (
        tok.join(F.broadcast(offsets), "shard")
        .withColumn("cum_end", F.col("off") + F.col("cum_in"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"(cum_end - n_tokens) DIV {PACK_CAP}").alias("bin_first"),
            F.expr(f"(cum_end - 1) DIV {PACK_CAP}").alias("bin_last"),
        )
        .withColumn("n_bins", F.col("bin_last") - F.col("bin_first") + F.lit(1))
        .orderBy("doc_id")
    )


text_pack_sequences.__doc__ = text_pack_sequences.__doc__.replace(
    "{SH}", str(PACK_SHARD)
)


TEXT_PACK_SEQUENCES_SQL = f"""
WITH tok AS (
  SELECT doc_id, len({TOKENS_DUCK}) AS n_tokens FROM documents
),
nz AS (SELECT * FROM tok WHERE n_tokens > 0),
cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_end
  FROM nz
)
SELECT doc_id, n_tokens,
       CAST((cum_end - n_tokens) // {PACK_CAP} AS BIGINT) AS bin_first,
       CAST((cum_end - 1) // {PACK_CAP} AS BIGINT) AS bin_last,
       CAST((cum_end - 1) // {PACK_CAP} - (cum_end - n_tokens) // {PACK_CAP} + 1
         AS BIGINT) AS n_bins
FROM cum
ORDER BY doc_id
"""


# --- Overlapping chunking (RAG / context-window splitting) -----------------
CHUNK_SIZE = 64     # tokens per chunk
CHUNK_STRIDE = 48   # new tokens per step; CHUNK_SIZE - CHUNK_STRIDE overlap


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token windows (size
    {C}, stride {S}) — the retrieval/context-window chunker.  A chunk
    starts at every stride multiple that still contributes unseen tokens
    (s == 0 or s + overlap < n), so coverage is total with no redundant
    tail chunk.  The chunk content hash proves the actual token slice, not
    just the offset arithmetic, and chunk_idx = tok_start / stride is
    derived arithmetically so neither engine needs ordinal explode.

    Scale: one narrow generate per doc (rows out ≈ n_tokens / stride), no
    shuffle before the deterministic output sort.
    """
    d = load_table(spark, sf_dir, "documents")
    overlap = CHUNK_SIZE - CHUNK_STRIDE
    return (
        d.withColumn("tokens", F.expr(TOKENS_SPARK))
        .withColumn("n", F.size("tokens"))
        .filter(F.col("n") > 0)
        .select(
            "doc_id",
            "n",
            "tokens",
            F.explode(
                F.expr(
                    f"filter(sequence(0, n - 1, {CHUNK_STRIDE}), "
                    f"s -> s = 0 OR s + {overlap} < n)"
                )
            ).alias("tok_start"),
        )
        .select(
            "doc_id",
            F.expr(f"tok_start DIV {CHUNK_STRIDE}").alias("chunk_idx"),
            "tok_start",
            F.expr(f"least({CHUNK_SIZE}, n - tok_start)").alias("chunk_len"),
            F.expr(
                f"md5(concat_ws(' ', slice(tokens, tok_start + 1, "
                f"least({CHUNK_SIZE}, n - tok_start))))"
            ).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


text_chunk_overlap.__doc__ = (
    text_chunk_overlap.__doc__.replace("{C}", str(CHUNK_SIZE)).replace(
        "{S}", str(CHUNK_STRIDE)
    )
)


TEXT_CHUNK_OVERLAP_SQL = f"""
WITH tk AS (
  SELECT doc_id, {TOKENS_DUCK} AS tokens, len({TOKENS_DUCK}) AS n
  FROM documents
),
st AS (
  SELECT doc_id, tokens, n,
         unnest(list_filter(range(0, n, {CHUNK_STRIDE}),
                            s -> s = 0 OR s + {CHUNK_SIZE - CHUNK_STRIDE} < n))
           AS tok_start
  FROM tk WHERE n > 0
)
SELECT doc_id,
       tok_start // {CHUNK_STRIDE} AS chunk_idx,
       tok_start,
       least({CHUNK_SIZE}, n - tok_start) AS chunk_len,
       md5(array_to_string(
             tokens[tok_start + 1 : tok_start + least({CHUNK_SIZE}, n - tok_start)],
             ' ')) AS chunk_hash
FROM st
ORDER BY doc_id, chunk_idx
"""


# --- Data mixing (token-budget source reweighting) -------------------------
MIX_SEED = "mix"
MIX_KEEP_DEN = 2  # global budget: keep ~1/2 of all tokens


def text_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: hit a target per-source token share under a global
    token budget.  Source s gets weight w_s = 1 + (src_num % 3); its
    sampling rate is min(1, budget * w_s / (sum_w * actual_tokens_s)), and
    documents are kept by deterministic hash threshold — stable under
    reruns and backfills, exact in expectation.

    Shape: one narrow token-count pass, a tiny per-source aggregate (20
    rows), rates broadcast back, then a stateless filter — the corpus
    itself is never shuffled.  Rates are quantized to basis points with a
    single floor() so both engines compare identical integers.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "source", F.size(F.expr(TOKENS_SPARK)).alias("n_tokens"))
    per = (
        tok.groupBy("source")
        .agg(F.sum("n_tokens").alias("actual"))
        .withColumn("w", F.expr("coalesce(try_cast(substring(source, 4, 10) AS INT), 0) % 3 + 1"))
    )
    tot = per.agg(F.sum("actual").alias("total"), F.sum("w").alias("sumw"))
    rates = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(
            "CAST(floor(least(1.0, (CAST(total AS DOUBLE) * CAST(w AS DOUBLE)) /"
            f" ({float(MIX_KEEP_DEN)} * CAST(sumw AS DOUBLE) * CAST(actual AS DOUBLE)))"
            " * 10000) AS BIGINT)"
        ).alias("rate_bp"),
    )
    h = hash60(F.col("doc_id").cast("string"), seed=MIX_SEED)
    return (
        tok.join(F.broadcast(rates), "source")
        .filter((h % 10000) < F.col("rate_bp"))
        .select("doc_id", "source", "n_tokens", "rate_bp")
        .orderBy("doc_id")
    )


def _mix_sql() -> str:
    h = hash60_sql("CAST(doc_id AS VARCHAR)", seed=MIX_SEED)
    return f"""
WITH tok AS (
  SELECT doc_id, source, len({TOKENS_DUCK}) AS n_tokens FROM documents
),
per AS (
  SELECT source, SUM(n_tokens) AS actual,
         coalesce(TRY_CAST(substr(source, 4, 10) AS INT), 0) % 3 + 1 AS w
  FROM tok GROUP BY source
),
tot AS (SELECT SUM(actual) AS total, SUM(w) AS sumw FROM per),
rates AS (
  SELECT source,
         CAST(floor(least(1.0, (CAST(total AS DOUBLE) * CAST(w AS DOUBLE)) /
           ({float(MIX_KEEP_DEN)} * CAST(sumw AS DOUBLE) * CAST(actual AS DOUBLE)))
           * 10000) AS BIGINT) AS rate_bp
  FROM per, tot
)
SELECT t.doc_id, t.source, t.n_tokens, r.rate_bp
FROM tok t JOIN rates r ON t.source = r.source
WHERE {h} % 10000 < r.rate_bp
ORDER BY t.doc_id
"""


TEXT_MIX_SOURCES_SQL = _mix_sql()


# --- Character-trigram LM plausibility score -------------------------------
#: docs whose trigrams average below this document frequency (ppm of docs)
#: are flagged as gibberish / out-of-distribution for the corpus.
LM_MIN_AVG_DF_PPM = 1000


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-model plausibility score (the KenLM /
    CCNet-style perplexity filter, re-expressed with integer-exact corpus
    statistics so both engines hash identically — no ``ln``/float sums).

    A document made of frequent corpus trigrams is in-distribution text; a
    document of rare trigrams is gibberish, wrong-charset, or a language
    the corpus does not contain.  Score = average document frequency of
    the doc's trigram instances, in ppm of corpus docs:
    ``(1e6 * Σ cnt·df) DIV (n_instances · n_docs)`` — all BIGINT
    arithmetic, one final truncating division spelled identically in both
    engines (int64-safe while Σ cnt·df < 9.2e12 · corpus docs).

    Scale shape: the per-position explode is collapsed map-side by the
    (doc_id, trigram, cnt) partial aggregate before anything shuffles; the
    per-trigram document frequency is a window count OVER that aggregate
    (one linear pipeline — no self-join, no cache to leak), partitioned on
    3-byte trigrams whose bounded key space (≤ charset³) keeps every
    partition small at any corpus size; the n_docs scalar rides a
    broadcast cross join (op_histogram's pattern).

    Trigrams are BYTE trigrams over ``encode(lower(text), 'UTF-8')``
    (fastText's convention): Spark's ``substr`` on a STRING seeks the i-th
    UTF-8 codepoint in O(i), which makes per-position extraction O(len²)
    per document — measured 22.8s → 5.9s at sf1 for the per-doc aggregate
    when switched to O(1) binary slicing.  The DuckDB oracle is
    byte-faithful via ``substr(hex(encode(..)))`` — byte offsets doubled
    over an ASCII hex string — so both engines count the SAME trigram
    multiset on any text, multibyte included (pinned by the non-ASCII
    fixture in tests/test_multibyte_oracle.py).
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.length("text") >= 3).withColumn(
        "lb", F.expr("encode(lower(text), 'UTF-8')")
    )
    # The per-doc trigram aggregate is computed ONCE and its per-trigram
    # document frequency is a window count over it — one linear pipeline,
    # so the position explode never re-runs and nothing needs persist()
    # (an earlier aggregate-then-self-join shape cached per_doc, which a
    # long-lived session never released).  The repartition spreads the
    # explode across all cores (the documents parquet arrives in a handful
    # of splits).
    per_doc = (
        base.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "lb",
            F.explode(F.expr("sequence(1, length(lb) - 2)")).alias("i"),
        )
        .select("doc_id", F.expr("substr(lb, i, 3)").alias("tri"))
        .groupBy("doc_id", "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # df(tri) = rows per trigram in per_doc (one row per (doc, tri) pair
    # == distinct-doc count), as a window so the aggregate isn't re-read.
    scored = per_doc.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tri"))
    )
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        scored
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_trigrams"),
            F.sum(F.col("cnt") * F.col("df")).alias("sum_df"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "n_trigrams",
            F.expr("(1000000 * sum_df) DIV (n_trigrams * n_docs)").alias(
                "lm_avg_df_ppm"
            ),
            F.expr(
                f"(1000000 * sum_df) DIV (n_trigrams * n_docs) >= {LM_MIN_AVG_DF_PPM}"
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


TEXT_LM_SCORE_SQL = f"""
WITH base AS (
  -- hex(encode(..)) makes the oracle BYTE-faithful to the Spark side's
  -- binary trigrams: substr offsets over the hex string are byte offsets
  -- doubled, and trigram IDENTITY (all this query aggregates on) is
  -- preserved exactly — multibyte text included
  SELECT doc_id, hex(encode(lower(text))) AS lh,
         octet_length(encode(lower(text))) AS nb
  FROM documents WHERE length(text) >= 3
),
inst AS (
  SELECT doc_id, substr(lh, CAST(2 * ci - 1 AS INT), 6) AS tri
  FROM base, unnest(range(1, nb - 1)) AS u(ci)
),
per_doc AS (
  SELECT doc_id, tri, CAST(count(*) AS BIGINT) AS cnt
  FROM inst GROUP BY doc_id, tri
),
dfs AS (
  SELECT tri, CAST(count(*) AS BIGINT) AS df FROM per_doc GROUP BY tri
),
nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base
),
agg AS (
  SELECT p.doc_id,
         CAST(sum(p.cnt) AS BIGINT)        AS n_trigrams,
         CAST(sum(p.cnt * d.df) AS BIGINT) AS sum_df
  FROM per_doc p JOIN dfs d USING (tri) GROUP BY p.doc_id
)
SELECT a.doc_id,
       a.n_trigrams,
       CAST((1000000 * a.sum_df) // (a.n_trigrams * nd.n_docs) AS BIGINT)
         AS lm_avg_df_ppm,
       (1000000 * a.sum_df) // (a.n_trigrams * nd.n_docs) >= {LM_MIN_AVG_DF_PPM}
         AS keep
FROM agg a, nd
ORDER BY doc_id
"""


def text_ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al.,
    arXiv:1911.00359 §4.3): rank every document within its language by the
    LM plausibility score and split into head / middle / tail terciles —
    the bucketing a pretraining pipeline uses to keep "head" data,
    down-weight "middle", and drop "tail".

    Exact-arithmetic form: CCNet cuts on perplexity terciles; engines
    disagree on float perplexity, so the cut is pure RANK selection over
    the integer-ppm ``text_lm_score`` (ties broken by doc_id):
    ``bucket = ((rank − 1) · 3) DIV n`` — no thresholds, no floats, the
    same nearest-rank philosophy as ``op_percentiles``.

    Scale: the LM-score pipeline's shuffles plus ONE window sort-shuffle
    on the language key (WindowExec streams sorted runs); the per-language
    count rides the same partitioning (no extra exchange — the
    op_percentiles round-10 pattern).
    """
    lm = text_lm_score(spark, sf_dir).select("doc_id", "lm_avg_df_ppm")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = lm.join(d, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("lm_avg_df_ppm"), F.asc("doc_id")
    )
    wn = Window.partitionBy("lang")
    r = j.withColumn("rnk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    label = F.expr(
        "CASE ((rnk - 1) * 3) DIV n WHEN 0 THEN 'head' "
        "WHEN 1 THEN 'middle' ELSE 'tail' END"
    )
    return (
        r.select("doc_id", "lang", "lm_avg_df_ppm", label.alias("bucket"))
        .orderBy("doc_id")
    )


TEXT_CCNET_BUCKET_SQL = f"""
WITH lm AS ({TEXT_LM_SCORE_SQL}),
ranked AS (
  SELECT l.doc_id, d.lang, l.lm_avg_df_ppm,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY l.lm_avg_df_ppm DESC, l.doc_id) AS rnk,
         CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT) AS n
  FROM lm l JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, lm_avg_df_ppm,
       CASE ((rnk - 1) * 3) // n WHEN 0 THEN 'head'
            WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
FROM ranked
ORDER BY doc_id
"""




# --- BPE tokenizer-vocabulary induction -------------------------------------
#: merge steps to learn; fixed so the DuckDB oracle can unroll the loop.
BPE_N_MERGES = 8
#: truncate the training loop's lineage every this many merges — merge
#: step k otherwise replays k replace stages (O(n²) total in merge count).
BPE_CHECKPOINT_EVERY = 16


def bpe_merges_from_words(words: DataFrame, n_merges: int = BPE_N_MERGES) -> DataFrame:
    """Learn ``n_merges`` byte-pair-encoding merges from a (token, wfreq)
    vocabulary DataFrame — the classic Sennrich et al. get_stats /
    merge_vocab loop (arXiv:1508.07909), the algorithm every production
    tokenizer (BPE/WordPiece-style) trains with.

    State encoding: a word's symbol sequence is one string of
    ``#sym ``-prefixed segments (``'abc'`` → ``'#a #b #c '``).  '#' cannot
    occur inside a symbol ([a-z0-9] tokens), so the merge step is a plain
    ``replace(state, '#x #y ', '#xy ')`` — both engines' replace scans
    left-to-right without overlap, which is EXACTLY BPE's merge order
    (verified on the '#a #a #a #a ' → '#aa #aa ' case in both).  Pair
    counts weight every adjacent position by word frequency; the argmax
    tie-breaks (count DESC, pair ASC — binary string order in both
    engines).

    Scale: the vocabulary is dimension-sized at any corpus scale (counts
    come from one token groupBy); the n_merges-iteration loop runs on that
    small frame with ONE driver-side scalar (the winning pair) per
    iteration — the sim_kmeans pattern, O(iterations) tiny actions, never
    O(data).  That per-rank round-trip is inherent to BPE's sequential
    definition (merge k+1's pair counts depend on merge k's result), so
    ``n_merges`` is the JOB-COUNT knob at scale: a 32k-merge production
    vocabulary means 32k tiny Spark jobs (~hours of fixed scheduling
    overhead on a cluster) — train large vocabs on the dimension-sized
    (token, wfreq) frame pulled into a single-node trainer, then apply the
    learned table distributively (text_bpe_tokenize's replace-chain path,
    which IS O(data) and shuffle-free).  Every ``BPE_CHECKPOINT_EVERY``
    merges the loop state is
    materialized and its predecessor's blocks released, so plan depth and
    executor storage stay bounded however high ``n_merges`` is raised
    (without this, step k replays k replace stages — O(n²) lineage).
    """
    from ..plans.layout import materialize, release

    spark = words.sparkSession
    base = words.select(
        F.expr("regexp_replace(token, '(.)', '#$1 ')").alias("state"),
        F.col("wfreq").cast("long").alias("wfreq"),
    ).persist()
    w = base
    ckpt = None  # current materialized loop state, released when superseded
    pair_expr = (
        "transform(sequence(1, size(syms) - 1), "
        "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1), ' '))"
    )
    out = []
    for rank in range(1, n_merges + 1):
        best = (
            w.select(F.split(F.trim(F.col("state")), " ").alias("syms"), "wfreq")
            .filter(F.size("syms") >= 2)
            .select(F.explode(F.expr(pair_expr)).alias("pat"), "wfreq")
            .groupBy("pat")
            .agg(F.sum("wfreq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pat").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pat, cnt = best[0]["pat"], best[0]["cnt"]
        merged = "#" + pat.replace("#", "").replace(" ", "") + " "
        out.append((rank, pat.strip(), merged.strip().lstrip("#"), int(cnt)))
        w = w.withColumn(
            "state", F.expr(f"replace(state, '{pat}', '{merged}')")
        )
        if rank % BPE_CHECKPOINT_EVERY == 0:
            new_ckpt = materialize(w)  # eager: old state fully consumed
            if ckpt is not None:
                release(ckpt)
            ckpt = w = new_ckpt
    base.unpersist()
    if ckpt is not None:
        release(ckpt)  # the merge table below is plain driver data
    return spark.createDataFrame(
        out, "merge_rank INT, pair STRING, merged STRING, pair_count BIGINT"
    )


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge table learned from the corpus token vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.expr(TOKENS_SPARK)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("wfreq"))
    )
    return bpe_merges_from_words(words).orderBy("merge_rank")


def _bpe_sql(n_merges: int = BPE_N_MERGES) -> str:
    """Unrolled DuckDB twin: one CTE trio (state → pair counts → argmax)
    per merge step; the winning pair enters the next stage's replace() as
    a scalar subquery."""
    # AS MATERIALIZED: DuckDB inlines plain CTEs, and this chain references
    # each stage several times (b{k} appears twice in w{k+1}) — inlining
    # makes the unrolled plan exponential in n_merges and the query hang.
    stages = [
        f"""w0 AS MATERIALIZED (
  SELECT regexp_replace(token, '(.)', '#\\1 ', 'g') AS state,
         CAST(count(*) AS BIGINT) AS wfreq
  FROM (SELECT unnest({TOKENS_DUCK}) AS token FROM documents) t
  GROUP BY token
)"""
    ]
    for k in range(n_merges):
        stages.append(
            f"""p{k} AS MATERIALIZED (
  SELECT syms[CAST(i AS INT)] || ' ' || syms[CAST(i AS INT) + 1] || ' ' AS pat,
         CAST(sum(wfreq) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(state), ' ') AS syms, wfreq FROM w{k}
        WHERE len(string_split(trim(state), ' ')) >= 2) s,
       unnest(range(1, len(syms))) u(i)
  GROUP BY 1
),
b{k} AS MATERIALIZED (SELECT pat, cnt FROM p{k} ORDER BY cnt DESC, pat ASC LIMIT 1),
w{k + 1} AS MATERIALIZED (
  SELECT replace(state, (SELECT pat FROM b{k}),
                 '#' || replace(replace((SELECT pat FROM b{k}), '#', ''), ' ', '') || ' ') AS state,
         wfreq
  FROM w{k}
)"""
        )
        # one output row per stage
    selects = "\nUNION ALL\n".join(
        f"SELECT {k + 1} AS merge_rank, trim(pat) AS pair, "
        f"replace(replace(trim(pat), '#', ''), ' ', '') AS merged, "
        f"cnt AS pair_count FROM b{k}"
        for k in range(n_merges)
    )
    return "WITH " + ",\n".join(stages) + "\n" + selects + "\nORDER BY merge_rank"


TEXT_BPE_MERGES_SQL = _bpe_sql()


def text_bpe_tokenize(
    spark: SparkSession, sf_dir: str, merges: DataFrame | None = None
) -> DataFrame:
    """Apply the learned BPE merges corpus-wide: per document, the subword
    piece count after segmenting every token with the merge table — the
    train-then-apply loop a real tokenizer pipeline runs, and the number
    that sizes a training run's token budget.

    ``merges`` — a pre-trained merge table (``text_bpe_merges`` output, or
    any frame with merge_rank/pair/merged columns).  A pipeline that has
    already trained passes it in so the apply pass costs zero driver-loop
    jobs; when omitted (the standalone registry entry) the table is
    trained here, once.

    Scale: the learned merge list is O(BPE_N_MERGES) plan-time constants,
    so the apply pass is a NARROW map over documents (a replace() chain
    inside codegen, one row per doc out, no shuffle but the final
    aggregate) — training cost is amortized over the dimension-sized
    vocabulary exactly once.
    """
    d = load_table(spark, sf_dir, "documents")
    if merges is None:
        words = (
            d.select(F.explode(F.expr(TOKENS_SPARK)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("wfreq"))
        )
        merges = bpe_merges_from_words(words)
    # merge application order is semantically significant — make it
    # explicit rather than relying on collect() preserving build order.
    rows = merges.orderBy("merge_rank").collect()  # O(BPE_N_MERGES) rows
    state = "regexp_replace(tok, '(.)', '#$1 ')"
    for m in rows:
        state = f"replace({state}, '{m.pair} ', '#{m.merged} ')"
    n_pieces = f"size(split(trim({state}), ' '))"
    return (
        d.select(
            "doc_id",
            F.explode(F.expr(TOKENS_SPARK)).alias("tok"),
        )
        .select("doc_id", F.expr(n_pieces).alias("np"), F.length("tok").alias("nc"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("np").alias("n_pieces"),
            F.sum("nc").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


def _bpe_tokenize_sql(n_merges: int = BPE_N_MERGES) -> str:
    """Oracle: the b0..b{n-1} argmax chain from _bpe_sql, then the same
    replace() chain applied to every token instance."""
    base = _bpe_sql(n_merges)
    ctes = base[len("WITH ") : base.index("\nSELECT 1 AS merge_rank")]
    state = "regexp_replace(tok, '(.)', '#\\1 ', 'g')"
    for k in range(n_merges):
        merged = (
            f"'#' || replace(replace((SELECT pat FROM b{k}), '#', ''), ' ', '') || ' '"
        )
        # b{k}.pat already carries its trailing space (see _bpe_sql's p{k})
        state = f"replace({state}, (SELECT pat FROM b{k}), {merged})"
    return f"""WITH {ctes},
toks AS (
  SELECT doc_id, unnest({TOKENS_DUCK}) AS tok FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(len(string_split(trim({state}), ' '))) AS BIGINT) AS n_pieces,
       CAST(sum(length(tok)) AS BIGINT) AS n_chars
FROM toks
GROUP BY doc_id
ORDER BY doc_id
"""


TEXT_BPE_TOKENIZE_SQL = _bpe_tokenize_sql()


# --- DSIR-style importance selection ----------------------------------------
#: hashed n-gram feature buckets (DSIR uses 10^4; bounded so the two
#: distribution tables broadcast and the per-doc aggregate collapses map-side)
DSIR_BUCKETS = 256
#: doc_id < this plays the target (eval/domain) set — the dedup module's
#: eval-set convention (dedup.EVAL_SET_MAX_DOC)
DSIR_TARGET_MAX_DOC = 20


def text_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al., arXiv:2302.03169): score every
    candidate document by how much its hashed n-gram feature distribution
    looks like a TARGET domain (the eval-set docs) versus the raw corpus,
    and keep the target-like ones — the importance-resampling selector a
    pretraining pipeline runs to up-weight domain-relevant data.

    Exact-arithmetic form (the cross-engine-verifiability price, as with
    text_lm_score): features are byte-bigram hash buckets
    (``hash60(hex(gram)) % {B}``); each side's bucket distribution is
    integer ppm (``1e6 * cnt DIV total``); a doc's score is
    ``Σ_b cnt_b · (target_ppm_b − corpus_ppm_b)`` in BIGINT — the
    importance log-ratio's sign structure with products instead of logs,
    deterministic on any engine.  ``keep = score > 0`` (more target-like
    than corpus-like).

    Scale: the per-position explode collapses map-side into (doc, bucket)
    counts (≤ {B} rows per doc) and is MATERIALIZED once
    (plans.layout.materialize — executor-block pin locally, reliable
    checkpoint under ``incresql.checkpoint.dir`` on a cluster): the five
    downstream reads (two per distribution table + the scoring fact) read
    rows instead of re-running the explode, which an earlier shape
    re-evaluated 5×.  Both distribution tables are {B} rows → broadcast
    joins; one fact shuffle on (doc_id, bucket).  The final per-doc score
    frame (one row per corpus doc) is pinned so the LARGE per_doc blocks
    (≤ {B} rows per doc) are released before returning — only the small
    returned score frame stays pinned, through the BOUNDED auto-pin
    registry (``plans.layout.materialize_bounded``): a long-lived session
    calling this repeatedly keeps at most ``incresql.materialize.
    auto_pins`` score frames alive (oldest released first); a caller may
    still ``plans.layout.release(result)`` early once consumed.
    Byte-sliced grams (O(1) offsets) with hex-encoded
    hashing so the DuckDB oracle is byte-faithful on any text (the
    winnow/lm_score pattern).
    """
    per_doc = layout.materialize(_dsir_per_doc(spark, sf_dir))
    out = layout.materialize_bounded(_dsir_score(per_doc))
    layout.release(per_doc)
    return out


def _dsir_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expensive half of DSIR: per-(doc, bucket) byte-bigram counts.
    One Generate explode, collapsed map-side — evaluated exactly once via
    materialize() in text_dsir_select (plan-locked in test_plans.py)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = f"({hash60_spark_sql('hex(substr(lb, i, 2))')}) % {DSIR_BUCKETS}"
    return (
        d.filter(F.length("text") >= 2)
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("lb", F.expr("encode(lower(text), 'UTF-8')"))
        .select(
            "doc_id",
            "lb",
            F.explode(F.expr("sequence(1, length(lb) - 1)")).alias("i"),
        )
        .select("doc_id", F.expr(bucket).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _dsir_score(per_doc: DataFrame) -> DataFrame:
    """The cheap half: distribution tables + broadcast-joined scoring over
    an already-materialized (doc, bucket, cnt) frame."""
    is_target = F.col("doc_id") < DSIR_TARGET_MAX_DOC

    def dist(df, name):
        per_b = df.groupBy("b").agg(F.sum("cnt").alias("n"))
        tot = df.agg(F.sum("cnt").alias("tot"))
        return (
            per_b.crossJoin(F.broadcast(tot))
            .select("b", F.expr("(1000000 * n) DIV tot").alias(name))
        )

    t_dist = dist(per_doc.filter(is_target), "t_ppm")
    c_dist = dist(per_doc.filter(~is_target), "c_ppm")
    return (
        per_doc.filter(~is_target)
        .join(F.broadcast(t_dist), "b", "left")
        .join(F.broadcast(c_dist), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(
                F.col("cnt")
                * (
                    F.coalesce("t_ppm", F.lit(0))
                    - F.coalesce("c_ppm", F.lit(0))
                )
            ).alias("dsir_score"),
        )
        .withColumn("keep", F.col("dsir_score") > 0)
        .orderBy("doc_id")
    )


text_dsir_select.__doc__ = text_dsir_select.__doc__.replace(
    "{B}", str(DSIR_BUCKETS)
)

TEXT_DSIR_SELECT_SQL = f"""
WITH hexed AS (
  SELECT doc_id, hex(encode(lower(text))) AS lh,
         octet_length(encode(lower(text))) AS nb
  FROM documents WHERE length(text) >= 2
),
per_doc AS (
  SELECT doc_id,
         ({hash60_sql("substr(lh, CAST(2 * ci - 1 AS INT), 4)")}) % {DSIR_BUCKETS} AS b,
         CAST(count(*) AS BIGINT) AS cnt
  FROM hexed, unnest(range(1, nb)) AS u(ci)
  GROUP BY 1, 2
),
t_tot AS (SELECT SUM(cnt) AS tot FROM per_doc WHERE doc_id < {DSIR_TARGET_MAX_DOC}),
c_tot AS (SELECT SUM(cnt) AS tot FROM per_doc WHERE doc_id >= {DSIR_TARGET_MAX_DOC}),
t_dist AS (
  SELECT b, (1000000 * SUM(cnt)) // (SELECT tot FROM t_tot) AS t_ppm
  FROM per_doc WHERE doc_id < {DSIR_TARGET_MAX_DOC} GROUP BY b
),
c_dist AS (
  SELECT b, (1000000 * SUM(cnt)) // (SELECT tot FROM c_tot) AS c_ppm
  FROM per_doc WHERE doc_id >= {DSIR_TARGET_MAX_DOC} GROUP BY b
)
SELECT p.doc_id,
       CAST(SUM(p.cnt) AS BIGINT) AS n_grams,
       CAST(SUM(p.cnt * (COALESCE(t.t_ppm, 0) - COALESCE(c.c_ppm, 0)))
            AS BIGINT) AS dsir_score,
       SUM(p.cnt * (COALESCE(t.t_ppm, 0) - COALESCE(c.c_ppm, 0))) > 0 AS keep
FROM per_doc p
LEFT JOIN t_dist t USING (b)
LEFT JOIN c_dist c USING (b)
WHERE p.doc_id >= {DSIR_TARGET_MAX_DOC}
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


# --- Gopher document-quality rules (Rae et al., arXiv:2112.11446 A1.1) -----
# The published word-level rules, evaluated per document from the shared
# tokens array: word-count bounds, mean-word-length bounds, symbol-to-word
# ratio ('#' and '...'), alphabetic-word fraction, and the required-word
# rule.  Gopher's required set is {the,be,to,of,and,that,have,with}; the
# corpus here is synthetic, so — exactly like LANG_MARKERS above — the set
# is drawn from its own vocabulary; the mechanism (distinct-presence count
# with a >= 2 threshold) is the deliverable.  Gopher's two LINE-level rules
# (bullet/ellipsis line fractions) belong to the line machinery and are
# covered by ``clean_lines`` / ``text_boilerplate``.
GOPHER_REQUIRED_WORDS = (
    "the", "a", "data", "key", "row", "table", "line", "value",
)
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_REQUIRED_HITS = 2
# Round 14 (VERDICT r13 task 7): Gopher's two repetition rules —
# duplicate-LINE and duplicate-PARAGRAPH character fractions (Rae et al.
# A1.1: "fraction of characters contained within duplicate lines /
# paragraphs") — which text_repetition's n-gram fractions do not cover.
# The synthetic corpus is single-line, so line structure is synthesized
# the text_boilerplate way: deterministic token slices (GOPHER_LINE_TOKENS
# tokens per line, GOPHER_PARA_LINES lines per paragraph, newline-joined);
# the char-fraction mechanism over that structure is the deliverable.
# Both fractions are informational columns — the keep flag keeps its
# round-13 five-rule semantics (r13 verdict: flag unchanged; the output
# gained columns, disclosed in COVERAGE.md).
GOPHER_LINE_TOKENS = 2
GOPHER_PARA_LINES = 2


def _gopher_slices(src: str, per: int, sep: str, dialect: str) -> str:
    """Array-of-strings expr: ``src`` sliced into ``per``-element chunks
    joined with ``sep`` — identical chunk boundaries in both engines
    (1-based inclusive slice clamped at the tail)."""
    n = f"CAST(ceil({{len}}({src}) / {per}.0) AS INT) - 1"
    if dialect == "spark":
        return (f"transform(sequence(0, {n.format(len='size')}), "
                f"i -> array_join(slice({src}, i * {per} + 1, {per}), "
                f"{sep}))")
    return (f"list_transform(generate_series(0, {n.format(len='len')}), "
            f"i -> array_to_string(list_slice({src}, i * {per} + 1, "
            f"i * {per} + {per}), {sep}))")


def _gopher_dup_frac(arr: str, dialect: str) -> str:
    """Fraction of characters inside elements that occur >= 2 times in
    ``arr`` — exact integer character counts on both sides, one DOUBLE
    quotient at the end.  O(elements^2) per document but a pure narrow
    expression: no shuffle, scales horizontally with the scan."""
    if dialect == "spark":
        dup = (f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + "
               f"IF(size(filter({arr}, y -> y = x)) >= 2, "
               f"CAST(length(x) AS BIGINT), CAST(0 AS BIGINT)))")
        tot = f"length(array_join({arr}, ''))"
    else:
        dup = (f"CAST(list_sum(list_transform({arr}, x -> CASE WHEN "
               f"len(list_filter({arr}, y -> y = x)) >= 2 THEN length(x) "
               f"ELSE 0 END)) AS BIGINT)")
        tot = f"length(array_to_string({arr}, ''))"
    return f"CAST({dup} AS DOUBLE) / CAST({tot} AS DOUBLE)"


def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule filter: the five word-level rules from Rae et
    al. (arXiv:2112.11446, A1.1) as one narrow projection — every feature
    derives from the shared tokens array plus two constant-pattern
    ``replace`` length diffs, so the whole operator is codegen'd Column
    arithmetic with NO shuffle except the deterministic ORDER BY.  At
    100 TB this is scan → project → write, the ideal shape (same class
    as text_stats, whose measured expression choices it reuses: the
    sum-of-token-lengths via ``length(concat_ws(...))``, bit-identical to
    the fold the oracle spells).

    Zero-token documents (no [a-z0-9] character at all) are excluded up
    front on BOTH engines — they have no words for any rule to judge, and
    without the guard Spark would emit NULL ratios while DuckDB's
    list_reduce over the empty list errors (round-13 review; same
    convention as text_boilerplate)."""
    d = load_table(spark, sf_dir, "documents")
    req = _sql_list(GOPHER_REQUIRED_WORDS)
    sum_tok_len = F.length(F.concat_ws("", F.col("tokens")))
    n_words = F.size("tokens")
    mean_len = sum_tok_len.cast("double") / n_words.cast("double")
    alpha_ratio = (
        F.expr("size(filter(tokens, t -> t rlike '[a-z]'))").cast("double")
        / n_words.cast("double")
    )
    symbol_cnt = F.expr(
        "(length(text) - length(replace(text, '#', ''))) + "
        "((length(text) - length(replace(text, '...', ''))) DIV 3)"
    )
    required_hits = F.expr(
        f"size(filter(array({req}), w -> array_contains(tokens, w)))"
    ).cast("int")
    df = (
        d.withColumn("tokens", F.expr(TOKENS_SPARK))
        .filter(F.size("tokens") >= 1)
        .withColumn("lines", F.expr(
            _gopher_slices("tokens", GOPHER_LINE_TOKENS, "' '", "spark")
        ))
        .withColumn("paras", F.expr(
            _gopher_slices("lines", GOPHER_PARA_LINES, "char(10)", "spark")
        ))
        .select(
            "doc_id",
            n_words.alias("n_words"),
            mean_len.alias("mean_word_len"),
            alpha_ratio.alias("alpha_word_ratio"),
            (symbol_cnt.cast("double") / n_words.cast("double")).alias(
                "symbol_word_ratio"
            ),
            required_hits.alias("required_hits"),
            F.expr(_gopher_dup_frac("lines", "spark")).alias(
                "dup_line_frac"
            ),
            F.expr(_gopher_dup_frac("paras", "spark")).alias(
                "dup_para_frac"
            ),
        )
    )
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MEAN_LEN_LO)
        & (F.col("mean_word_len") <= GOPHER_MEAN_LEN_HI)
        & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA_RATIO)
        & (F.col("required_hits") >= GOPHER_MIN_REQUIRED_HITS)
    )
    return df.withColumn("keep", keep).orderBy("doc_id")


TEXT_GOPHER_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, text, {TOKENS_DUCK} AS tokens FROM documents
), tl AS (
  SELECT *, {_gopher_slices("tokens", GOPHER_LINE_TOKENS, "' '", "duck")} AS lines
  FROM t WHERE len(tokens) >= 1
), tp AS (
  SELECT *, {_gopher_slices("lines", GOPHER_PARA_LINES, "chr(10)", "duck")} AS paras
  FROM tl
), f AS (
  SELECT doc_id,
         len(tokens) AS n_words,
         CAST(list_reduce(list_transform(tokens, t -> length(t)), (a,b) -> a+b) AS DOUBLE)
           / CAST(len(tokens) AS DOUBLE) AS mean_word_len,
         CAST(len(list_filter(tokens, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
           / CAST(len(tokens) AS DOUBLE) AS alpha_word_ratio,
         CAST(((length(text) - length(replace(text, '#', '')))
               + ((length(text) - length(replace(text, '...', ''))) // 3)) AS DOUBLE)
           / CAST(len(tokens) AS DOUBLE) AS symbol_word_ratio,
         CAST(len(list_filter([{_sql_list(GOPHER_REQUIRED_WORDS)}],
                              w -> list_contains(tokens, w))) AS INT) AS required_hits,
         {_gopher_dup_frac("lines", "duck")} AS dup_line_frac,
         {_gopher_dup_frac("paras", "duck")} AS dup_para_frac
  FROM tp
)
SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, symbol_word_ratio, required_hits,
       dup_line_frac, dup_para_frac,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND mean_word_len >= {GOPHER_MEAN_LEN_LO} AND mean_word_len <= {GOPHER_MEAN_LEN_HI}
        AND symbol_word_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
        AND alpha_word_ratio >= {GOPHER_MIN_ALPHA_RATIO}
        AND required_hits >= {GOPHER_MIN_REQUIRED_HITS}) AS keep
FROM f ORDER BY doc_id
"""


# --- BM25 lexical top-k search (Robertson & Zaragoza, FnTIR 2009) -----------
# A fixed query workload over the corpus: Okapi BM25 with k1=1.2, b=0.75.
# Scores are kept integer-exact for cross-engine bit-equality: every factor
# (tf, dl, df, N, T=total tokens) is an exact integer, the k1/b rationals
# are multiplied through (x10T), and the log-idf is replaced by its exact
# rational argument (N-df+0.5)/(df+0.5) = (2(N-df)+1)/(2df+1).  The
# substitution is monotone PER TERM — each term's contribution is a strictly
# increasing function of its true BM25 contribution — but summed multi-term
# scores are a deterministic BM25 VARIANT, not guaranteed to reproduce
# log-idf BM25's ranking for multi-term queries (a monotone per-term map
# does not commute with summation; round-13 advice).  What the operator
# guarantees is self-consistency: num/den stay single exact integers whose
# DOUBLE quotient is bit-identical in both engines (the sim_topk_cosine /
# text_lm_score recipe).  Intermediates use DECIMAL(38,0) in Spark and
# HUGEINT in the oracle so the products cannot overflow i64 at sf10+ (num ~
# 2e19 at 5M docs); the exact-integer -> DOUBLE casts are routed through a
# decimal STRING on both engines because a string->double parse is
# guaranteed correctly rounded everywhere, whereas DuckDB's direct
# HUGEINT->DOUBLE conversion (upper*2^64 + lower in double arithmetic)
# can be 1 ulp off past 2^53 (round-13 advice; boundary values pinned in
# tests/test_round13_ops.py).
BM25_TOP_K = 10
#: (query_id, terms) — terms drawn from the synthetic corpus vocabulary
#: (the workload is a parameter of a search operator, exactly like
#: sim_topk_cosine's vec_id < N_QUERIES convention); term lists are summed
#: in sorted order so the float accumulation order is pinned in both
#: engines.
BM25_QUERIES = (
    (1, ("fast", "scan")),
    (2, ("join", "merge", "sort")),
    (3, ("hash", "vector")),
    (4, ("batch", "query", "slow")),
)
_BM25_TERMS = tuple(sorted({t for _, ts in BM25_QUERIES for t in ts}))


def _bm25_num_den(term: str, cast: str) -> tuple[str, str]:
    """(numerator, denominator) SQL for one term's BM25 contribution.
    ``cast`` is the engine's exact-wide-integer type (DECIMAL(38,0) /
    HUGEINT).  score_term = num/den as DOUBLE; tf=0 makes num exactly 0,
    so missing terms add 0.0 to the score without a CASE."""
    tf = f"tf_{term}"
    df = f"df_{term}"
    num = f"(CAST((2*(n - {df}) + 1) AS {cast}) * 22 * {tf} * t)"
    den = f"(CAST((2*{df} + 1) AS {cast}) * (10*{tf}*t + 3*t + 9*dl*n))"
    return num, den


def _bm25_branch_exprs(qid: int, terms: tuple, cast: str) -> tuple[str, str]:
    """(score, n_terms) SQL fragments for one query's branch.  The wide
    integers become DOUBLE via a decimal-string round-trip (``cast`` also
    selects the engine's string type) — string->double parsing is
    correctly rounded in both engines, unlike DuckDB's direct
    HUGEINT->DOUBLE arithmetic conversion (1-ulp risk past 2^53)."""
    s = "VARCHAR" if cast == "HUGEINT" else "STRING"
    parts = []
    for t in sorted(terms):
        num, den = _bm25_num_den(t, cast)
        parts.append(
            f"CAST(CAST({num} AS {s}) AS DOUBLE) / "
            f"CAST(CAST({den} AS {s}) AS DOUBLE)"
        )
    score = " + ".join(parts)
    nterms = " + ".join(
        f"(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)" for t in sorted(terms)
    )
    return score, nterms


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k per query over the documents corpus.

    Plan shape (the scale story): per-doc term frequencies come from the
    tokens array via literal-term ``filter`` counts — NO token explode and
    NO (doc, term) shuffle at all, because the query workload is known at
    plan time.  Corpus statistics (N, total tokens, per-term document
    frequencies) are ONE tiny global aggregate broadcast back onto a second
    narrow pass; each document then emits its per-query scores through a
    single generated literal-struct array (one scan, rows x |queries|).
    The only real shuffle is the final per-query top-k window, which
    Spark's WindowGroupLimit rewrites into partial per-partition top-k
    before the exchange — so the few-partition window never sees more than
    k x partitions rows per query even at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    perdoc = d.withColumn("tokens", F.expr(TOKENS_SPARK)).select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("dl"),
        *[
            F.expr(f"size(filter(tokens, t -> t = '{t}'))")
            .cast("bigint")
            .alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    stats = perdoc.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("t"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    scored = perdoc.crossJoin(F.broadcast(stats))
    branches = []
    for qid, terms in BM25_QUERIES:
        score, nterms = _bm25_branch_exprs(qid, terms, "DECIMAL(38,0)")
        branches.append(
            f"named_struct('query_id', {qid}, 'score', {score}, "
            f"'n_terms', CAST({nterms} AS INT))"
        )
    q = scored.select(
        "doc_id", F.expr(f"explode(array({', '.join(branches)}))").alias("q")
    ).select("doc_id", "q.query_id", "q.score", "q.n_terms")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        q.filter(F.col("n_terms") >= 1)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("query_id", "rank", "doc_id", "score", "n_terms")
        .orderBy("query_id", "rank")
    )


def bm25_search_table(docs: DataFrame, queries: DataFrame,
                      top_k: int = BM25_TOP_K) -> DataFrame:
    """Table-driven BM25 top-k: the production search operator (round-13
    advice — ``text_bm25_search``'s workload is a plan-time literal and
    cannot accept a query set without regenerating the plan).

    ``docs``: (doc_id, text); ``queries``: (query_id, term) rows — any
    number of queries, supplied as DATA.  Same k1=1.2 / b=0.75 rational
    scoring as the literal operator, but per-term contributions are
    accumulated as exact INTEGER parts-per-billion (floor(num*1e9/den) in
    DECIMAL(38,0) space): an integer sum is order-independent, so the
    score is deterministic under any partitioning — which a float sum
    over a data-driven groupBy would not be (the literal operator pins
    its float addition order in the expression text; a shuffle cannot).

    Plan shape: tokenize -> explode -> broadcast-semi-join the distinct
    query terms (the corpus never shuffles on raw tokens; non-query
    tokens die at the broadcast filter) -> ONE (doc, dl, term) aggregate.
    Everything downstream operates on the MATCHED-PAIRS frame, never the
    corpus: per-term document frequency is an unordered window count over
    that same frame (a groupBy-then-join-back would make Catalyst
    recompute the whole scan/explode/shuffle subtree — caught in this
    function's first plan audit), then a broadcast join of the query
    table, ONE (query, doc) integer-sum aggregate, and the per-query
    top-k window (WindowGroupLimit partial top-k before its exchange).
    Corpus stats (N, total tokens) are a separate NARROW scan + scalar
    aggregate broadcast in.  The corpus is scanned twice and shuffled
    once; exactly one explode exists in the plan (test-pinned)."""
    toks = docs.select(
        "doc_id", F.expr(TOKENS_SPARK).alias("tokens")
    ).select(
        "doc_id", F.size("tokens").cast("bigint").alias("dl"),
        F.explode("tokens").alias("term"),
    )
    terms = queries.select("term").distinct()
    tf = (
        toks.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .withColumn(
            "df",
            F.count("*").over(Window.partitionBy("term")).cast("bigint"),
        )
    )
    dls = docs.select(
        F.expr(f"CAST(size({TOKENS_SPARK}) AS BIGINT)").alias("dl")
    )
    stats = dls.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("t"),
    )
    scored = (
        tf.join(F.broadcast(queries), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib_ppb",
            F.expr(
                "CAST((CAST((2*(n - df) + 1) AS DECIMAL(38,0)) * 22 * tf"
                " * t * 1000000000)"
                " DIV (CAST((2*df + 1) AS DECIMAL(38,0))"
                " * (10*tf*t + 3*t + 9*dl*n)) AS BIGINT)"
            ),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib_ppb").alias("score_ppb"),
        F.count("*").cast("int").alias("n_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_ppb").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "doc_id", "score_ppb", "n_terms")
        .orderBy("query_id", "rank")
    )


def text_bm25_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query for the table-driven BM25 operator (round-15 verdict
    task 4): same workload as ``text_bm25_search`` but supplied as DATA —
    a small in-plan (query_id, term) frame — through ``bm25_search_table``,
    so the driver exercises the production search path (broadcast term
    filter, single explode, integer-ppb accumulation, WindowGroupLimit
    top-k) rather than the plan-time-literal sibling."""
    d = load_table(spark, sf_dir, "documents")
    workload = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id INT, term STRING",
    )
    return bm25_search_table(d, workload)


def _bm25_table_sql() -> str:
    """Oracle for text_bm25_table: the workload as a VALUES CTE, the same
    ppb integer accumulation (HUGEINT intermediates, BIGINT out)."""
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
    )
    return f"""
WITH workload(query_id, term) AS (VALUES {rows}),
toks AS (
  SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl,
         unnest(tokens) AS term
  FROM (SELECT doc_id, {TOKENS_DUCK} AS tokens FROM documents)
),
tf0 AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term IN (SELECT DISTINCT term FROM workload)
  GROUP BY doc_id, dl, term
),
tf AS (
  SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
  FROM tf0
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(len({TOKENS_DUCK}) AS BIGINT)) AS BIGINT) AS t
  FROM documents
),
scored AS (
  SELECT w.query_id, tf.doc_id,
         CAST((CAST((2*(n - df) + 1) AS HUGEINT) * 22 * tf * t
               * 1000000000)
              // (CAST((2*df + 1) AS HUGEINT)
                  * (10*tf*t + 3*t + 9*dl*n)) AS BIGINT) AS contrib_ppb
  FROM tf JOIN workload w USING (term), stats
),
agg AS (
  SELECT query_id, doc_id,
         CAST(SUM(contrib_ppb) AS BIGINT) AS score_ppb,
         CAST(COUNT(*) AS INT) AS n_terms
  FROM scored GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_ppb, n_terms,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_ppb DESC, doc_id ASC) AS rank
  FROM agg
)
SELECT query_id, rank, doc_id, score_ppb, n_terms
FROM ranked WHERE rank <= {BM25_TOP_K}
ORDER BY query_id, rank
"""


TEXT_BM25_TABLE_SQL = _bm25_table_sql()


def _bm25_sql() -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(tokens, t -> t = '{t}')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in _BM25_TERMS
    )
    branches = []
    for qid, terms in BM25_QUERIES:
        score, nterms = _bm25_branch_exprs(qid, terms, "HUGEINT")
        branches.append(
            f"SELECT doc_id, {qid} AS query_id, {score} AS score, "
            f"CAST({nterms} AS INT) AS n_terms FROM scored"
        )
    union = "\n  UNION ALL\n  ".join(branches)
    return f"""
WITH perdoc AS (
  SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {TOKENS_DUCK} AS tokens FROM documents)
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t,
         {df_cols}
  FROM perdoc
),
scored AS (SELECT * FROM perdoc, stats),
q AS (
  {union}
),
ranked AS (
  SELECT query_id, doc_id, score, n_terms,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM q WHERE n_terms >= 1
)
SELECT query_id, rank, doc_id, score, n_terms
FROM ranked WHERE rank <= {BM25_TOP_K}
ORDER BY query_id, rank
"""


TEXT_BM25_SEARCH_SQL = _bm25_sql()


# --- Count-Min sketch heavy hitters (Cormode & Muthukrishnan, 2005) ---------
# The frequency sibling of op_hll_distinct: token frequencies in O(d*w)
# memory with one bounded shuffle, vs text_vocab's exact full-key
# aggregation.  Counters are exact integer sums over md5-derived buckets,
# so the whole sketch — including the min-over-rows estimate — is
# cross-engine bit-exact and value-hash checkable.  CMS_W is chosen SMALL
# (16) relative to a production 2^20 because the synthetic corpus's ~40
# token vocabulary would never collide at a realistic width — the
# collision handling (overestimates bounded by the row minimum, never an
# underestimate) is the mechanism under test, exactly the LANG_MARKERS
# adaptation convention.  The exact counts ride along as verification
# (they are the full-key shuffle CMS exists to avoid at 100 TB).
CMS_D = 4     # hash rows (gate geometry)
CMS_W = 16    # buckets per row — DELIBERATE collision-stress test geometry
CMS_PROD_W = 1 << 20   # production default width (see cms_sketch)
CMS_TOP, CMS_BOTTOM = 15, 5


def cms_bounds(width: int, depth: int) -> tuple[int, int]:
    """Textbook CMS guarantee (Cormode & Muthukrishnan 2005, Thm 1):
    with probability >= 1 - delta, cms_est <= exact_cnt + eps * N where
    eps = e/w and delta = e^-d.  Returned as integer parts-per-million /
    parts-per-billion literals — Python-computed and embedded identically
    in the Spark plan and the DuckDB oracle, the HLL/KMV rse_ppm
    treatment (relational.py:1486) applied to the last estimator family
    (r15 verdict task 5), so every CMS row is self-describing about its
    error envelope."""
    import math

    return (round(math.e / width * 1_000_000),
            round(math.exp(-depth) * 1_000_000_000))


def _cms_seeds(depth: int) -> str:
    return ", ".join(str(i) for i in range(depth))


def _cms_bucket_spark(width: int) -> str:
    """Seeded bucket expr — identical md5 input "<i>|<tok>" in both
    engines."""
    return "({h} % {w})".format(
        h=hash60_spark_sql("concat(CAST(i AS STRING), '|', tok)"), w=width
    )


def _cms_bucket_duck(width: int) -> str:
    return "({h} % {w})".format(h=hash60_sql("'' || i || '|' || tok"),
                                w=width)


def cms_sketch(toks: DataFrame, width: int = CMS_PROD_W,
               depth: int = CMS_D) -> DataFrame:
    """The d x w Count-Min counter frame (i, b, c) for a ``tok`` column.
    Counters are ADDITIVE, so sketches of disjoint batches sum-merge
    exactly (the incremental maintainer's basis,
    streaming/cms_incremental.py).  Only occupied buckets materialize, so
    a production width (default 2^20) costs state proportional to
    min(d*w, d*|vocab|), not d*w.

    r18 shape: per-token counts FIRST (one map-side-combined exchange on
    tok, bounded by task-local vocabulary), then the d seeded md5 buckets
    per DISTINCT token summed into the counters — c(i, b) is the sum of
    the counts of the tokens hashing there, identical to counting raw
    (tok, i) pairs.  The md5 pipeline and the d-way explode shrink from
    O(|tokens|) to O(|vocab|) rows (Zipf: vocab ≪ tokens); measured
    1.3-1.5s → 0.3s on the sf0.1 production sketch with equal output."""
    seeds = _cms_seeds(depth)
    counts = toks.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("__cnt")
    )
    pairs = counts.select(
        "tok", "__cnt", F.explode(F.expr(f"array({seeds})")).alias("i")
    ).withColumn("b", F.expr(_cms_bucket_spark(width)))
    return pairs.groupBy("i", "b").agg(
        F.sum("__cnt").cast("bigint").alias("c")
    )


def cms_probe(sketch: DataFrame, cands: DataFrame, width: int = CMS_PROD_W,
              depth: int = CMS_D) -> DataFrame:
    """Estimate each candidate token's frequency as the MINIMUM of its d
    counters (CMS point query — never an underestimate).  ``cands`` must
    carry a ``tok`` column; any extra columns ride through.  Geometry must
    match the sketch's."""
    key_cols = cands.columns
    probes = cands.select(
        "*", F.explode(F.expr(f"array({_cms_seeds(depth)})")).alias("i")
    ).withColumn("b", F.expr(_cms_bucket_spark(width)))
    # a candidate absent from every bucket of a row has count 0; the join
    # is inner because every probed (i, b) bucket of a PRESENT token is
    # occupied by construction, and absent tokens estimate as the bucket's
    # collision mass anyway — coalesce to 0 only if the bucket is empty
    return (
        probes.join(F.broadcast(sketch), ["i", "b"], "left")
        .groupBy(*key_cols)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


def cms_sketch_from_counts(exact: DataFrame, width: int,
                           depth: int) -> DataFrame:
    """The d x w counter frame derived from per-token exact counts instead
    of the raw token stream: c(i, b) = Σ_{tok hashing to (i, b)} count(tok),
    identical counters by definition (r18).  Lets a caller that ALREADY
    aggregated the corpus once (the heavy-hitter verification report)
    build the sketch from |vocab| rows instead of re-tokenizing the
    corpus — the batch operator's second full pass, removed."""
    seeds = _cms_seeds(depth)
    pairs = exact.select(
        "tok", "exact_cnt", F.explode(F.expr(f"array({seeds})")).alias("i")
    ).withColumn("b", F.expr(_cms_bucket_spark(width)))
    return pairs.groupBy("i", "b").agg(
        F.sum("exact_cnt").cast("bigint").alias("c")
    )


def text_cms_heavyhitters(
    spark: SparkSession, sf_dir: str,
    width: int = CMS_W, depth: int = CMS_D,
) -> DataFrame:
    """CMS frequency estimates for the corpus's top-{CMS_TOP} and
    bottom-{CMS_BOTTOM} tokens: build the d x w counter sketch via
    ``cms_sketch``, then estimate each candidate as the minimum of its d
    counters.  Invariant pinned by the oracle and tests: cms_est >=
    exact_cnt always (CMS never underestimates), with the overestimate
    column showing collision pressure.  The GATE defaults pin width=16 —
    a deliberate collision-stress geometry against the synthetic ~40-token
    vocabulary; production callers pass a real width (cms_sketch defaults
    to 2^20) or use ``text_cms_sketch_only``'s shape, which also drops the
    exact ride-along columns (round-13 advice: geometry and verification
    are now parameters, not hard-codes)."""
    d = load_table(spark, sf_dir, "documents")
    toks = cms_tokens(d)
    # sketch=None → the report derives the counters from its own pinned
    # per-token counts (cms_sketch_from_counts): ONE corpus
    # tokenize+aggregate pass total instead of three (sketch, top
    # candidates, bottom candidates each re-ran the scan before r18)
    return cms_heavyhitter_report(None, toks, width, depth)


def cms_tokens(docs: DataFrame) -> DataFrame:
    """The shared (tok) stream the sketch and its verification both
    consume."""
    return docs.select(F.explode(F.expr(TOKENS_SPARK)).alias("tok"))


def cms_heavyhitter_report(sketch: DataFrame | None, toks: DataFrame,
                           width: int, depth: int) -> DataFrame:
    """Verification shaping shared by the batch operator and the
    incremental maintainer's gate query: exact per-token counts pick the
    top-{CMS_TOP} + bottom-{CMS_BOTTOM} candidates, each probed against
    ``sketch``, with the overestimate column showing collision pressure.
    ``sketch=None`` (the batch operator) derives the counters from the
    exact counts (``cms_sketch_from_counts`` — identical values, no
    second corpus pass).

    The exact-count frame is materialized once (r18): three downstream
    branches consume it (top candidates, bottom candidates, and the
    derived sketch when ``sketch=None``), and each would otherwise
    re-run the corpus tokenize+aggregate — the measured bulk of the
    row's cost.  |vocab| rows pinned, auto-released via the bounded
    registry.

    Candidate selection is two orderBy().limit(k) frames, NOT a global
    row_number window: Spark plans each as TakeOrderedAndProject —
    per-task partial top-k, no single-partition window — so the
    selection scales to an arbitrarily large vocabulary (a global-rank
    window ships the whole vocab to one partition, and Spark does not
    infer a group limit for an unpartitioned window).  Deterministic
    tie-break on tok in both engines."""
    from ..plans.layout import materialize_bounded

    exact = materialize_bounded(toks.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("exact_cnt")
    ))
    if sketch is None:
        sketch = cms_sketch_from_counts(exact, width, depth)
    cands_top = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("tok").asc()
    ).limit(CMS_TOP)
    cands_bot = exact.orderBy(
        F.col("exact_cnt").asc(), F.col("tok").asc()
    ).limit(CMS_BOTTOM)
    cands = cands_top.unionByName(cands_bot).distinct()
    est = cms_probe(sketch, cands, width, depth)
    eps_ppm, delta_ppb = cms_bounds(width, depth)
    return (
        est.select(
            "tok", "exact_cnt", "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
            F.lit(eps_ppm).cast("bigint").alias("eps_ppm"),
            F.lit(delta_ppb).cast("bigint").alias("delta_ppb"),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col("tok").asc())
    )


text_cms_heavyhitters.__doc__ = (
    text_cms_heavyhitters.__doc__
    .replace("{CMS_TOP}", str(CMS_TOP))
    .replace("{CMS_BOTTOM}", str(CMS_BOTTOM))
)


def text_cms_sketch_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH-ONLY: the production CMS path — sketch at the production
    geometry (w=2^20, d=4: collision probability per row ~|vocab|/2^20)
    plus point-queries for a fixed candidate token list, with NO exact
    per-token aggregation ride-along (that full-key shuffle is the thing
    CMS exists to avoid; round-13 advice).  Not a gate query: the gate's
    text_cms_heavyhitters pins the same sketch/probe arithmetic against
    the DuckDB oracle at the collision-stress geometry."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.expr(TOKENS_SPARK)).alias("tok"))
    sketch = cms_sketch(toks, CMS_PROD_W, CMS_D)
    cands = spark.createDataFrame(
        [(t,) for t in _BM25_TERMS], ["tok"]
    )
    eps_ppm, delta_ppb = cms_bounds(CMS_PROD_W, CMS_D)
    return (
        cms_probe(sketch, cands, CMS_PROD_W, CMS_D)
        .select(
            "*",
            F.lit(eps_ppm).cast("bigint").alias("eps_ppm"),
            F.lit(delta_ppb).cast("bigint").alias("delta_ppb"),
        )
        .orderBy("tok")
    )


def _cms_sql(where: str = "") -> str:
    """``where`` restricts the corpus (e.g. the retraction gate query's
    NET corpus after a wave is retracted — round 17)."""
    seeds, bucket = _cms_seeds(CMS_D), _cms_bucket_duck(CMS_W)
    eps_ppm, delta_ppb = cms_bounds(CMS_W, CMS_D)
    return f"""
WITH toks AS (
  SELECT unnest(tokens) AS tok
  FROM (SELECT {TOKENS_DUCK} AS tokens FROM documents {where})
),
pairs AS (
  SELECT u.i AS i, {bucket} AS b
  FROM toks, unnest([{seeds}]) AS u(i)
),
sketch AS (
  SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY i, b
),
exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM toks GROUP BY tok
),
cands AS (
  SELECT tok, exact_cnt FROM
    (SELECT tok, exact_cnt FROM exact
     ORDER BY exact_cnt DESC, tok ASC LIMIT {CMS_TOP})
  UNION
  SELECT tok, exact_cnt FROM
    (SELECT tok, exact_cnt FROM exact
     ORDER BY exact_cnt ASC, tok ASC LIMIT {CMS_BOTTOM})
),
probes AS (
  SELECT tok, exact_cnt, u.i AS i, {bucket} AS b
  FROM cands, unnest([{seeds}]) AS u(i)
),
est AS (
  SELECT p.tok, p.exact_cnt, MIN(s.c) AS cms_est
  FROM probes p JOIN sketch s ON s.i = p.i AND s.b = p.b
  GROUP BY p.tok, p.exact_cnt
)
SELECT tok, exact_cnt, cms_est, cms_est - exact_cnt AS overestimate,
       CAST({eps_ppm} AS BIGINT) AS eps_ppm,
       CAST({delta_ppb} AS BIGINT) AS delta_ppb
FROM est
ORDER BY exact_cnt DESC, tok ASC
"""


TEXT_CMS_HEAVYHITTERS_SQL = _cms_sql()


# --- Grouped CMS: per-group heavy hitters ------------------------------------
# Completes the grouped-sketch matrix (quantiles r14, HLL r15): the
# per-language top-token report a 100 TB curation job wants without a
# per-(group, token) full-key exchange surviving to the output.  The
# sketch key becomes (group, row, bucket) — the counter exchange is
# bounded at |groups| x d x w rows per task; probes run per (group,
# candidate).  As in the flat operator, exact per-(g, tok) counts ride
# along as the GATE's candidate selector + verification; production
# callers probe a known candidate list against the group's sketch.
CMS_GROUP_TOP = 5


def cms_grouped_tokens(docs: DataFrame) -> DataFrame:
    """The shared (g, tok) stream the grouped sketch and its verification
    both consume — shared with the incremental maintainer so maintained
    counters come from the exact same code path."""
    return docs.select(
        F.col("lang").alias("g"),
        F.explode(F.expr(TOKENS_SPARK)).alias("tok"),
    )


def cms_grouped_sketch(toks: DataFrame, width: int = CMS_W,
                       depth: int = CMS_D) -> DataFrame:
    """The per-group d x w counter frame (g, i, b, c) — counters are
    ADDITIVE per (g, i, b) key, so sketches of disjoint batches sum-merge
    exactly (the grouped maintainer's basis).  r18: per-(g, tok) counts
    first, then the seeded buckets per distinct (g, tok) summed — the
    cms_sketch counts-first shape (identical counters, md5 work shrinks
    from O(|tokens|) to O(|groups| x |vocab|))."""
    seeds = _cms_seeds(depth)
    counts = toks.groupBy("g", "tok").agg(
        F.count("*").cast("bigint").alias("__cnt")
    )
    pairs = counts.select(
        "g", "tok", "__cnt", F.explode(F.expr(f"array({seeds})")).alias("i")
    ).withColumn("b", F.expr(_cms_bucket_spark(width)))
    return pairs.groupBy("g", "i", "b").agg(
        F.sum("__cnt").cast("bigint").alias("c")
    )


def cms_grouped_sketch_from_counts(exact: DataFrame, width: int,
                                   depth: int) -> DataFrame:
    """Per-group counter frame derived from exact (g, tok) counts —
    identical counters to ``cms_grouped_sketch`` over the raw stream
    (c(g, i, b) sums the counts of the tokens hashing there), built from
    |groups| x |vocab| rows instead of a second corpus pass (r18)."""
    seeds = _cms_seeds(depth)
    pairs = exact.select(
        "g", "tok", "exact_cnt",
        F.explode(F.expr(f"array({seeds})")).alias("i"),
    ).withColumn("b", F.expr(_cms_bucket_spark(width)))
    return pairs.groupBy("g", "i", "b").agg(
        F.sum("exact_cnt").cast("bigint").alias("c")
    )


def cms_grouped_report(sketch: DataFrame | None, toks: DataFrame,
                       width: int = CMS_W,
                       depth: int = CMS_D) -> DataFrame:
    """Verification shaping shared by the batch operator and the
    incremental maintainer's gate query: exact per-(g, tok) counts pick
    each group's top-{CMS_GROUP_TOP} candidates through a row_number
    window Spark rewrites to WindowGroupLimit (at most
    {CMS_GROUP_TOP} x |groups| rows forwarded per partition), each
    probed against the per-group ``sketch``.  ``sketch=None`` (the batch
    operator) derives the counters from the exact counts — identical
    values, one corpus pass instead of two; the exact frame is pinned
    via the bounded registry since both branches consume it (r18)."""
    from ..plans.layout import materialize_bounded

    seeds = _cms_seeds(depth)
    exact = toks.groupBy("g", "tok").agg(
        F.count("*").cast("bigint").alias("exact_cnt")
    )
    if sketch is None:
        # only the batch operator pins: with a derived sketch the exact
        # frame has TWO consumers (candidates + counters); a maintainer-
        # provided sketch leaves one consumer, where an eager pin would
        # only add a job (measured: the grouped-incremental bench row
        # regressed ~0.4s with an unconditional pin)
        exact = materialize_bounded(exact)
        sketch = cms_grouped_sketch_from_counts(exact, width, depth)
    wk = Window.partitionBy("g").orderBy(
        F.col("exact_cnt").desc(), F.col("tok").asc()
    )
    cands = (
        exact.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= CMS_GROUP_TOP)
        .drop("rk")
    )
    probes = cands.select(
        "g", "tok", "exact_cnt",
        F.explode(F.expr(f"array({seeds})")).alias("i"),
    ).withColumn("b", F.expr(_cms_bucket_spark(width)))
    est = probes.join(sketch, ["g", "i", "b"]).groupBy(
        "g", "tok", "exact_cnt"
    ).agg(F.min("c").alias("cms_est"))
    eps_ppm, delta_ppb = cms_bounds(width, depth)
    return est.select(
        "g", "tok", "exact_cnt", "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        F.lit(eps_ppm).cast("bigint").alias("eps_ppm"),
        F.lit(delta_ppb).cast("bigint").alias("delta_ppb"),
    ).orderBy("g", F.col("exact_cnt").desc(), F.col("tok").asc())


def text_cms_grouped(
    spark: SparkSession, sf_dir: str,
    width: int = CMS_W, depth: int = CMS_D,
) -> DataFrame:
    """Per-lang CMS frequency estimates for each language's top-
    {CMS_GROUP_TOP} tokens.  Candidate selection is a row_number window
    per group — Spark rewrites it through WindowGroupLimit, so every
    partition forwards at most {CMS_GROUP_TOP} x |groups| candidate rows
    (the op_quantile_grouped shape); gate geometry w=16 keeps the
    collision-stress property of the flat operator."""
    toks = cms_grouped_tokens(load_table(spark, sf_dir, "documents"))
    # sketch=None → derived from the report's own pinned exact counts:
    # one corpus tokenize+aggregate pass instead of two (r18)
    return cms_grouped_report(None, toks, width, depth)


text_cms_grouped.__doc__ = text_cms_grouped.__doc__.replace(
    "{CMS_GROUP_TOP}", str(CMS_GROUP_TOP)
)
cms_grouped_report.__doc__ = cms_grouped_report.__doc__.replace(
    "{CMS_GROUP_TOP}", str(CMS_GROUP_TOP)
)


def _cms_grouped_sql() -> str:
    seeds, bucket = _cms_seeds(CMS_D), _cms_bucket_duck(CMS_W)
    eps_ppm, delta_ppb = cms_bounds(CMS_W, CMS_D)
    return f"""
WITH toks AS (
  SELECT g, unnest(tokens) AS tok
  FROM (SELECT lang AS g, {TOKENS_DUCK} AS tokens FROM documents)
),
pairs AS (
  SELECT g, tok, u.i AS i FROM toks, unnest([{seeds}]) AS u(i)
),
sketch AS (
  SELECT g, i, {bucket} AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs GROUP BY g, i, {bucket}
),
exact AS (
  SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM toks GROUP BY g, tok
),
cands AS (
  SELECT g, tok, exact_cnt FROM (
    SELECT g, tok, exact_cnt,
           ROW_NUMBER() OVER (PARTITION BY g
                              ORDER BY exact_cnt DESC, tok ASC) AS rk
    FROM exact
  ) WHERE rk <= {CMS_GROUP_TOP}
),
probes AS (
  SELECT g, tok, exact_cnt, u.i AS i, {bucket} AS b
  FROM cands, unnest([{seeds}]) AS u(i)
),
est AS (
  SELECT p.g, p.tok, p.exact_cnt, MIN(s.c) AS cms_est
  FROM probes p JOIN sketch s ON s.g = p.g AND s.i = p.i AND s.b = p.b
  GROUP BY p.g, p.tok, p.exact_cnt
)
SELECT g, tok, exact_cnt, cms_est,
       cms_est - exact_cnt AS overestimate,
       CAST({eps_ppm} AS BIGINT) AS eps_ppm,
       CAST({delta_ppb} AS BIGINT) AS delta_ppb
FROM est
ORDER BY g, exact_cnt DESC, tok ASC
"""


TEXT_CMS_GROUPED_SQL = _cms_grouped_sql()


QUERIES = {
    "text_stats": text_stats,
    "text_repetition": text_repetition,
    "text_oov": text_oov,
    "text_sample_stratified": text_sample_stratified,
    "text_sample_temperature": text_sample_temperature,
    "text_ccnet_bucket": text_ccnet_bucket,
    "text_vocab": text_vocab,
    "text_langid": text_langid,
    "text_tokens": text_tokens,
    "text_fingerprint": text_fingerprint,
    "text_pii_scrub": text_pii_scrub,
    "text_boilerplate": text_boilerplate,
    "text_pack_sequences": text_pack_sequences,
    "text_chunk_overlap": text_chunk_overlap,
    "text_mix_sources": text_mix_sources,
    "text_lm_score": text_lm_score,
    "text_bpe_merges": text_bpe_merges,
    "text_bpe_tokenize": text_bpe_tokenize,
    "text_dsir_select": text_dsir_select,
    "text_gopher_quality": text_gopher_quality,
    "text_bm25_search": text_bm25_search,
    "text_bm25_table": text_bm25_table,
    "text_cms_grouped": text_cms_grouped,
    "text_cms_heavyhitters": text_cms_heavyhitters,
}

ORACLE = {
    "text_stats": TEXT_STATS_SQL,
    "text_repetition": TEXT_REPETITION_SQL,
    "text_oov": TEXT_OOV_SQL,
    "text_sample_stratified": TEXT_SAMPLE_STRATIFIED_SQL,
    "text_sample_temperature": TEXT_SAMPLE_TEMPERATURE_SQL,
    "text_ccnet_bucket": TEXT_CCNET_BUCKET_SQL,
    "text_vocab": TEXT_VOCAB_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "text_tokens": TEXT_TOKENS_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "text_pii_scrub": TEXT_PII_SCRUB_SQL,
    "text_boilerplate": TEXT_BOILERPLATE_SQL,
    "text_pack_sequences": TEXT_PACK_SEQUENCES_SQL,
    "text_chunk_overlap": TEXT_CHUNK_OVERLAP_SQL,
    "text_mix_sources": TEXT_MIX_SOURCES_SQL,
    "text_lm_score": TEXT_LM_SCORE_SQL,
    "text_bpe_merges": TEXT_BPE_MERGES_SQL,
    "text_bpe_tokenize": TEXT_BPE_TOKENIZE_SQL,
    "text_dsir_select": TEXT_DSIR_SELECT_SQL,
    "text_gopher_quality": TEXT_GOPHER_QUALITY_SQL,
    "text_bm25_search": TEXT_BM25_SEARCH_SQL,
    "text_bm25_table": TEXT_BM25_TABLE_SQL,
    "text_cms_grouped": TEXT_CMS_GROUPED_SQL,
    "text_cms_heavyhitters": TEXT_CMS_HEAVYHITTERS_SQL,
}

BENCH_QUERIES = {
    "text_stats": text_stats,
    "text_repetition": text_repetition,
    "text_dsir_select": text_dsir_select,
    # round 14 (VERDICT r13 task 3): the production CMS path — sketch at
    # w=2^20 + fixed-candidate point queries, no exact ride-along
    "text_cms_sketch_only": text_cms_sketch_only,
    # round 15: the grouped CMS (per-lang heavy hitters) and the
    # table-driven BM25 gate query — tracks the data-driven search path
    # per round (disclosed in BASELINE.md; like-for-like totals exclude
    # both when comparing to pre-r15 rounds)
    "text_cms_grouped": text_cms_grouped,
    "text_bm25_table": text_bm25_table,
}
