"""SemDeDup-style semantic deduplication over an embedding column.

Near-duplicate *meaning* (paraphrases, template rewrites, translations
re-embedded into a shared space) survives every lexical dedup tier —
MinHash, SimHash, winnowing all key on surface n-grams. The standard
scale recipe (Abbas et al., "SemDeDup", 2023) is:

1. k-means the embeddings into ``n_cells`` clusters,
2. score cosine similarity only WITHIN each cluster,
3. keep one representative per semantic-duplicate group.

This module is a pure composition of two existing scale paths:
:func:`swarm_spark.ops.ivf.kmeans_cells` (deterministic Lloyd rounds,
9-digit-rounded means — the same bit-reproducible centroid contract
the IVF ANN oracle relies on) and
:func:`swarm_spark.ops.dedup.embedding_dup_pairs` (per-cell BLAS gram
matrix inside ``applyInPandas``). Nothing here is new physics — the
point is that the learned cell assignment plugs straight into the
pluggable ``cell_col`` blocking of the embedding dedup operator.

Scale shape: the quadratic is per-cell (SemDeDup's core trade — raise
``n_cells`` until cells fit a worker), the k-means round-trips only
k×dim floats through the driver, and the pair scoring is one shuffle
on the cell id. No all-pairs stage exists at any ``n_cells``.

Reference scope note: the reference engine (m-mizutani/swarm) has no
embedding tier; this extends the corpus-curation surface the way its
schema-rule tier extends ingestion (SURVEY.md §2 add-ons).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import keep_one_per_cluster
from .dedup import embedding_dup_pairs
from .ivf import kmeans_cells


def semantic_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    vectorized: bool = True,
) -> DataFrame:
    """(id_a, id_b, cell, cos) for same-cell pairs with cosine ≥
    ``threshold``, cells learned by deterministic k-means.

    ``vectorized=True`` scores each cell with one numpy gram matmul;
    ``False`` keeps the pure-DataFrame join whose fold-order dot is
    bit-identical to the DuckDB oracle (both emit the same rows at 9
    rounded digits).
    """
    cells = kmeans_cells(df, vec_col, id_col, k=n_cells, iters=iters)
    with_cells = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
    ).join(cells, "id")
    return embedding_dup_pairs(
        with_cells,
        vec_col="__v",
        id_col="id",
        cell_col="cell",
        threshold=threshold,
        vectorized=vectorized,
    )


def semantic_keep_one(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
) -> DataFrame:
    """Corpus with one representative (min id) kept per semantic-
    duplicate group; groups are connected components over the
    same-cell cosine-≥-threshold pair graph (large-star/small-star,
    O(log n) rounds — no driver-side union-find)."""
    pairs = semantic_dup_pairs(
        df, vec_col, id_col, n_cells=n_cells, iters=iters, threshold=threshold
    )
    return keep_one_per_cluster(df, pairs, id_col, "id_a", "id_b")
