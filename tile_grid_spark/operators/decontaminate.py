"""Train/test cross-corpus decontamination via word n-gram collisions.

The standard eval-hygiene pass for training-data pipelines (the GPT-3
appendix / Gopher §A.8 recipe, re-expressed relationally): a training
document is contaminated if it shares any length-n word shingle with
any held-out evaluation document. This is DELIBERATELY a different
operator from near-dup detection (operators/dedup.py): contamination is
an asymmetric containment test against a second, usually much smaller,
corpus — not a similarity join within one corpus.

Scale shape: both sides explode to DISTINCT (doc, shingle) pairs
staged through real token columns (the Catalyst HOF O(len^2) trap —
see functions/text.with_rolling_fingerprints); the join key is the
shingle string itself, so a DuckDB oracle replays it verbatim. At
100 TB the eval side is tiny by construction — Spark's AQE broadcasts
it — while the train side streams map-side; if both sides were huge
you would pre-hash the shingle to a 64-bit key to slim the exchange
(md5_hash60 in operators/dedup.py is the oracle-replayable way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles_from_tokens


def _doc_ngrams(df: DataFrame, id_col: str, text: str, n: int, out_id: str) -> DataFrame:
    toks = df.select(
        F.col(id_col).alias(out_id),
        F.split(F.trim(F.lower(F.col(text))), r"\s+").alias("_toks"),
    )
    sh = toks.select(out_id, word_shingles_from_tokens(F.col("_toks"), n).alias("_sh"))
    return sh.select(out_id, F.explode(F.array_distinct("_sh")).alias("ng"))


def contamination_stats(
    train: DataFrame,
    test: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Per contaminated training doc: (train_id, n_shared_ngrams,
    n_test_docs) — how many distinct n-grams it shares with the eval
    corpus and how many eval docs it collides with. Docs sharing fewer
    than `min_hits` distinct n-grams are clean and absent. Tokenization
    matches functions/text.word_shingles (lower, trim, \\s+ split;
    docs shorter than n words contribute their whole text as the one
    shingle)."""
    tr = _doc_ngrams(train, id_col, text, n, "train_id")
    te = _doc_ngrams(test, id_col, text, n, "test_id")
    j = tr.join(te, "ng")
    out = j.groupBy("train_id").agg(
        F.countDistinct("ng").alias("n_shared_ngrams"),
        F.countDistinct("test_id").alias("n_test_docs"),
    )
    return out.where(F.col("n_shared_ngrams") >= F.lit(min_hits))


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """The filtered training corpus: drop every doc contamination_stats
    flags (left anti join on the id — one extra short-key exchange)."""
    bad = contamination_stats(train, test, n, id_col, text, min_hits).select(
        F.col("train_id").alias(id_col)
    )
    return train.join(bad, id_col, "left_anti")
