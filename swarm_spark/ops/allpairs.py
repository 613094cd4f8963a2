"""All-pairs TF-IDF cosine similarity over an inverted index.

The lexical counterpart of the embedding near-dup tier
(:mod:`~swarm_spark.ops.dedup`'s ``embedding_dup_pairs``): find every
document pair whose TF-IDF vectors' cosine exceeds a threshold,
WITHOUT an all-pairs stage. Public technique: the inverted-index /
candidate-generation family of Bayardo, Ma & Srikant 2007 ("Scaling Up
All Pairs Similarity Search") — a pair can only score > 0 if the docs
share a term, so candidates come from a postings self-join; frequent
terms (stopwords) contribute near-zero IDF weight but quadratic
candidates, so a document-frequency cap prunes them, the same
candidate-bounding discipline as the n-gram Jaccard / MinHash tiers
(Bayardo's per-term prefix bound is sharper but threshold-dependent;
the df cap keeps the plan oracle-able and its candidate count
predictable a priori: sum over kept terms of df^2).

Determinism contract (the repo's): weights are integer milli-nats
(tf * round(1000 * ln(N/df)) — the ln-round idiom every retrieval
oracle here uses), dot products and norms are exact bigint sums, and
the final cosine is ONE fixed float expression of exact integers
(IEEE sqrt is correctly rounded, so `round(dot * 1e6 / (sqrt(na2) *
sqrt(nb2)))` reproduces bit-for-bit in DuckDB).

Scale shape: tf/df are map-side-combined vocab-sized aggregations;
the self-join fans out only df-capped postings; the (a, b) dot
aggregation is map-side combinable; norms join back by doc id. No
CartesianProduct, no window over an unbounded group, nothing
corpus-sized on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


def auto_allpairs_max_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_pairs_per_row: int = 8,
    floor: int = 16,
) -> int:
    """Token-level df cap from the MEASURED df histogram — the same
    linear-candidate-budget selection as the jaccard/minhash tiers'
    :func:`~swarm_spark.ops.dedup.auto_max_df` (a term in d docs
    contributes min(d, cap)^2 candidate rows, so the budget bounds the
    join's quadratic term by construction), fed the distinct (doc,
    token) frame through that function's shingle hook. On Zipfian
    vocabularies the cap floats up (no recall lost); on a saturated
    vocabulary it grows only ~sqrt(N), keeping candidates linear —
    the SCALING.md dilemma, encoded for this tier too. ``floor`` is
    the recall contract: set it >= the largest true dup-cluster
    size."""
    from .dedup import auto_max_df

    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_col(text_col)).alias("sh"),
        )
        .where(F.length("sh") > 0)
        .distinct()
    )
    return auto_max_df(
        df,
        budget_pairs_per_row=budget_pairs_per_row,
        floor=floor,
        shingles=toks,
    )


def tfidf_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | str = 100,
    n_docs: int | None = None,
) -> DataFrame:
    """(id, tok, w): integer milli-nat TF-IDF postings, df-capped.
    Terms with df > ``max_df`` (quadratic candidates, near-zero idf),
    df < 2 (can never pair), and idf_milli = 0 (df = N corpus-wide
    terms — zero weight contributes nothing to any dot or norm, and
    keeping them can leave a doc with an all-zero vector whose cosine
    denominator divides by zero) are pruned. ``n_docs``: pass the
    stored corpus size to skip the sizing count. ``max_df="auto"``
    derives the cap from the measured df histogram
    (:func:`auto_allpairs_max_df`) — one extra vocab-sized
    aggregation buys a linear candidate budget at any vocabulary
    shape."""
    if max_df == "auto":
        max_df = auto_allpairs_max_df(df, text_col, id_col)
    if not isinstance(max_df, int) or max_df < 2:
        raise ValueError(f"max_df must be >= 2 or 'auto', got {max_df}")
    n = int(n_docs) if n_docs is not None else df.count()
    # split("") yields [''] — drop zero-length tokens so empty-gram docs
    # contribute nothing (>= 2 such docs would otherwise pair at cos 1.0
    # on the empty-string "term")
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("tok")
    ).where(F.length("tok") > 0)
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfq = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= max_df))
        .withColumn(
            "idf_milli",
            F.round(F.log(F.lit(n) * F.lit(1.0) / F.col("df")) * 1000).cast("long"),
        )
        .where(F.col("idf_milli") > 0)
    )
    return tf.join(dfq, "tok").select(
        "id", "tok", (F.col("tf") * F.col("idf_milli")).cast("long").alias("w")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold_micro: int = 600_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | str = 100,
    n_docs: int | None = None,
) -> DataFrame:
    """(a, b, dot, cos_micro): every doc pair with TF-IDF cosine >=
    ``threshold_micro`` (micro-units, 600000 = 0.6). Exactness caveat
    wired into the types: weights are milli-nat ints, so dot/norms stay
    exact bigints (keep per-doc vocab within ~2^20 terms to stay clear
    of the 2^63 sum bound) and the one float division is deterministic.

    Candidates are bounded by the df cap: only pairs sharing a kept
    term are ever materialized — sum(df^2) over kept terms, not
    |docs|^2. ``max_df="auto"`` derives the cap from the measured df
    histogram under a linear candidate budget."""
    if threshold_micro < 1:
        raise ValueError(f"threshold_micro must be >= 1, got {threshold_micro}")
    post = tfidf_postings(df, text_col, id_col, max_df, n_docs)
    norms = post.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    pairs = (
        post.select(F.col("id").alias("a"), "tok", F.col("w").alias("wa"))
        .join(
            post.select(F.col("id").alias("b"), "tok", F.col("w").alias("wb")),
            "tok",
        )
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"))
    )
    scored = (
        pairs.join(norms.select(F.col("id").alias("a"), F.col("n2").alias("na2")), "a")
        .join(norms.select(F.col("id").alias("b"), F.col("n2").alias("nb2")), "b")
        .select(
            "a",
            "b",
            "dot",
            F.round(
                F.col("dot") * F.lit(1_000_000.0)
                / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")))
            )
            .cast("long")
            .alias("cos_micro"),
        )
    )
    return scored.where(F.col("cos_micro") >= threshold_micro)
