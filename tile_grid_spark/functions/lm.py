"""Corpus-trained bigram language-model quality scoring.

The KenLM-shaped signal a training-data pipeline uses to rank documents
by fluency: train n-gram counts ON the corpus itself (one pass), then
score every document by its average bigram log-probability under the
add-k-smoothed model. Low scores flag boilerplate, lorem-ipsum, OCR
garbage and wrong-language slices that per-document heuristics
(functions/text.with_quality_features) cannot see, because the model
encodes what the REST of the corpus looks like.

Extends the reference's per-document text analysis surface (the
reference engine, pka/tile-grid, has no corpus-global text ops — this
is engine-superset territory like operators/dedup.py) with the
corpus-global second moment.

Scale shape (100 TB): two count aggregations (map-side partial combine,
one exchange each), then the exploded (doc, w1, w2) stream joins the
count tables by key — shuffle joins on short string keys, NOT
broadcasts: a web-corpus vocabulary is ~1e8 unigrams / ~1e10 bigrams,
far past broadcast limits, and Spark's sort-merge join with AQE skew
splitting handles the stop-word-bigram hot keys. The vocabulary size
(one scalar) rides along as a broadcast-able 1-row frame instead of a
driver collect, so the whole score is ONE lazy plan. Everything is
native Column expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text: str) -> F.Column:
    return F.split(F.trim(F.lower(F.col(text))), r"\s+")


def doc_bigrams(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, in order. Docs
    with fewer than two tokens contribute nothing. Token and slice
    arrays are staged as real columns (the measured-25x Catalyst HOF
    rule — see CLAUDE.md) before the zip/explode."""
    staged = (
        df.select(F.col(id_col).alias("_id"), _tokens(text).alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") >= 2)
        .withColumn("_heads", F.slice("_toks", 1, F.col("_n") - 1))
        .withColumn("_tails", F.slice("_toks", 2, F.col("_n") - 1))
    )
    return staged.select(
        "_id", F.explode(F.arrays_zip("_heads", "_tails")).alias("_bg")
    ).select(
        F.col("_id").alias(id_col),
        F.col("_bg._heads").alias("w1"),
        F.col("_bg._tails").alias("w2"),
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document average bigram log-probability under the corpus's
    own add-k bigram model:

        logP(w2 | w1) = ln( (c(w1,w2) + k) / (c(w1) + k * V) )

    with V = corpus unigram vocabulary size and c() corpus-wide counts
    (unigram counts over FULL token streams, so the final token of each
    doc conditions like any other). Returns one row per doc with >= 2
    tokens: (id_col, n_bigrams, avg_logp) — avg_logp rounded to 6
    decimals, which absorbs the float-sum-order indeterminacy of a
    distributed double sum while keeping ~7 significant digits of the
    model signal.
    """
    bg = doc_bigrams(df, id_col, text)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    toks = df.select(F.explode(_tokens(text)).alias("w"))
    unigram_counts = toks.groupBy("w").agg(F.count("*").alias("c1"))
    vocab = unigram_counts.agg(F.count("*").alias("_v"))  # 1 row
    scored = (
        bg.join(bigram_counts, ["w1", "w2"])
        .join(unigram_counts.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_logp",
            F.log(
                (F.col("c12") + F.lit(add_k))
                / (F.col("c1") + F.lit(add_k) * F.col("_v"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            (F.round(F.avg("_logp"), 6) + F.lit(0.0)).alias("avg_logp"),
        )
    )
