"""Sampled INDEPENDENT verification of the minhash near-dup pair set at
big SF (round-12 verdict task 5).

Round 12 proved the sf10 incremental maintainer's 26.3M-pair output
fingerprint-equal to the batch ``dedup_minhash_lsh`` — an ENGINE-CONSTANT
equivalence (the DuckDB batch-LSH oracle itself OOM'd at 97 GB on the
tiled corpus).  This tool restores independent evidence cheaply: it
hash-samples ~TARGET emitted pairs and ~TARGET rejected band candidates
(deterministic ``pmod(hash(doc_a, doc_b), K)`` filter — reproducible, no
rand()), joins the samples back to the RAW document text, and recomputes
exact 3-token-shingle Jaccard in PURE PYTHON (``re.findall`` + set
algebra inside an Arrow ``mapInPandas``) — an implementation sharing no
expression code with the operator.  Asserts, collect-free (only verdict
counts reach the driver):

- every sampled emitted pair: python n_common == operator n_common,
  python jaccard == operator jaccard (1e-12), jaccard >= 0.5;
- every sampled rejected candidate: python jaccard < 0.5.

Usage: python tools/verify_minhash_sample.py [sf_dir] [target_sample]
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

THRESHOLD = 0.5


def _python_jaccard_check(it):
    """Arrow-batched independent recompute: tokens via the same PUBLIC
    regex contract ([a-z0-9]+ on lowercased text), 3-token shingles as
    Python sets — no Spark expressions, no shared operator code."""
    import pandas as pd

    tok_re = re.compile(r"[a-z0-9]+")
    for pdf in it:
        out = []
        for r in pdf.itertuples(index=False):
            ta = tok_re.findall(r.text_a.lower())
            tb = tok_re.findall(r.text_b.lower())
            sha = {" ".join(ta[i:i + 3]) for i in range(len(ta) - 2)}
            shb = {" ".join(tb[i:i + 3]) for i in range(len(tb) - 2)}
            nc = len(sha & shb)
            union = len(sha) + len(shb) - nc
            j = (nc / union) if union else 0.0
            out.append(
                (
                    int(nc == r.n_common),
                    int(abs(j - r.jaccard) < 1e-12),
                    int(j >= THRESHOLD),
                )
            )
        yield pd.DataFrame(
            out, columns=["nc_match", "j_match", "ge_threshold"]
        )


def main() -> int:
    from pyspark.sql import functions as F

    from incresql_spark.operators import dedup
    from incresql_spark.operators.text import load_table
    from incresql_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf10"
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    spark = get_spark("verify_minhash_sample")
    t0 = time.time()
    docsh = dedup._doc_shingles(spark, sf_dir).persist()
    bands = dedup.minhash_bands_long(docsh).persist()
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_id", "bk")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "bk")
    candidates = (
        a.join(b, ["band_id", "bk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = docsh.select(F.col("doc_id").alias("doc_a"),
                      F.col("shingles").alias("sha"),
                      F.col("n_shingles").alias("na"))
    sb = docsh.select(F.col("doc_id").alias("doc_b"),
                      F.col("shingles").alias("shb"),
                      F.col("n_shingles").alias("nb"))
    # score EVERY band candidate, keep only the narrow columns persisted
    # (the shingle arrays would not fit at sf10)
    scored = (
        candidates.join(sa, ["doc_a"])
        .join(sb, ["doc_b"])
        .withColumn("n_common", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .persist()
    )
    n_emitted = scored.filter(F.col("jaccard") >= THRESHOLD).count()
    n_rejected = scored.filter(F.col("jaccard") < THRESHOLD).count()
    score_s = time.time() - t0

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    report = {"sf_dir": sf_dir, "n_emitted": n_emitted,
              "n_rejected": n_rejected, "score_s": round(score_s, 1)}
    ok = True
    for label, pred, n in (
        ("emitted", F.col("jaccard") >= THRESHOLD, n_emitted),
        ("rejected", F.col("jaccard") < THRESHOLD, n_rejected),
    ):
        t1 = time.time()
        k = max(1, n // target)
        sample = scored.filter(pred).filter(
            F.expr(f"pmod(hash(doc_a, doc_b), {k})") == 0)
        with_text = (
            F.broadcast(sample)
            .join(docs.select(F.col("doc_id").alias("doc_a"),
                              F.col("text").alias("text_a")), ["doc_a"])
            .join(docs.select(F.col("doc_id").alias("doc_b"),
                              F.col("text").alias("text_b")), ["doc_b"])
        )
        verdicts = with_text.mapInPandas(
            _python_jaccard_check,
            "nc_match int, j_match int, ge_threshold int",
        )
        agg = verdicts.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("nc_match").alias("nc_match"),
            F.sum("j_match").alias("j_match"),
            F.sum("ge_threshold").alias("ge"),
        ).collect()[0]
        row = {
            "sampled": int(agg["n"]), "modulus": k,
            "python_n_common_match": int(agg["nc_match"] or 0),
            "python_jaccard_match": int(agg["j_match"] or 0),
            "python_ge_threshold": int(agg["ge"] or 0),
            "wall_s": round(time.time() - t1, 1),
        }
        if label == "emitted":
            ok &= (row["sampled"] > 0
                   and row["python_n_common_match"] == row["sampled"]
                   and row["python_jaccard_match"] == row["sampled"]
                   and row["python_ge_threshold"] == row["sampled"])
        else:
            ok &= (row["sampled"] > 0
                   and row["python_n_common_match"] == row["sampled"]
                   and row["python_jaccard_match"] == row["sampled"]
                   and row["python_ge_threshold"] == 0)
        report[label] = row
    report["pass"] = bool(ok)
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
