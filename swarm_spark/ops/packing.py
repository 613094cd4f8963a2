"""Sequence packing for training-data pipelines.

A pretraining batch is a fixed token window (context length C); raw
documents have wildly varying lengths, so the pipeline must pack them
into windows with minimal padding. Two standard disciplines, both
deterministic (pure functions of the corpus, reproducible across
partitionings):

- **Concat-and-chunk** (:func:`pack_concat_chunks`) — concatenate all
  documents in a fixed order and cut every C tokens; documents may
  span window boundaries (the GPT-style pretraining layout). This is
  EXACTLY expressible with a prefix sum: a document occupying token
  interval [start, end) intersects windows
  floor(start/C) .. floor((end-1)/C). The global prefix sum is
  computed in TWO PHASES — range-partition by id, cumsum inside each
  partition in parallel, then add each partition's broadcast offset
  (per-partition subtotals are metadata-sized) — so there is no
  single-partition global sort bottleneck; plus a per-row explode of
  the (usually 1-2) spanned windows. Fully codegen.

- **Greedy bin packing, no splitting** (:func:`pack_greedy_bins`) —
  documents keep their boundaries; a bin closes when the next document
  does not fit (first-fit-sequential in a fixed order). The running
  fill state is inherently sequential, so the corpus is first hashed
  into ``num_buckets`` independent packing groups (deterministic
  md5 buckets — the same partition-invariance contract as
  ops.sampling) and each group packs in one ``applyInPandas`` pass.
  Scale shape: one shuffle on the bucket id; each bucket's state scan
  is O(bucket size) in Arrow batches; bucket count tunes parallelism
  independently of cluster layout. Oversized documents (> C tokens)
  get a bin of their own (flagged), matching what a real pipeline
  truncates downstream.

At 100 TB: concat-and-chunk is the throughput path (pure codegen);
greedy bins exist for curricula that must not split documents. Both
have exact DuckDB oracles (the greedy one via a sequential recursive
CTE) — see ops_queries.SQL_PACK_CHUNKS / SQL_PACK_BINS.

Token counts are whitespace tokens (``ops.text.tokens_col``) so the
packing arithmetic is integral and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket
from .text import tokens_col


def pack_concat_chunks(
    df: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    approx_rows: int | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: global order by ``id_col``, windows of
    ``capacity`` tokens, documents split across boundaries.

    The exclusive prefix sum of token counts in global ``id_col``
    order is built WITHOUT a global single-partition sort: the id
    space is cut into ``num_partitions`` ranges at LITERAL boundary
    values (taken from a deterministic md5-sampled, driver-sorted id
    sample — metadata-sized, like IVF centroids), each range cumsums
    in parallel, and per-range subtotals come back as exclusive
    offsets through a broadcast join. Because the range id is a pure
    function of the row and literals — never ``spark_partition_id``
    over a sampled repartition — every execution of the plan assigns
    identical ranges, with no persist needed for consistency.

    Output, one row per (document, window it intersects):
    (doc_id, n_tok, window_id, off, take) where ``off`` is the slice's
    offset inside the window and ``take`` how many of the document's
    tokens land there. Σ take per window = capacity (except the tail).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    base, _total = token_prefix(
        df, text_col, id_col, num_partitions, approx_rows, count_col
    )
    spanned = base.select(
        "doc_id",
        "n_tok",
        "start",
        F.explode(
            F.sequence(
                # integer div: exact at any corpus size (no double round)
                F.expr(f"start div {int(capacity)}"),
                F.expr(f"(end - 1) div {int(capacity)}"),
            )
        ).alias("window_id"),
    )
    win_lo = F.col("window_id") * capacity
    lo = F.greatest(F.col("start"), win_lo)
    hi = F.least(F.col("start") + F.col("n_tok"), win_lo + capacity)
    return spanned.select(
        "doc_id",
        "n_tok",
        "window_id",
        (lo - win_lo).cast("long").alias("off"),
        (hi - lo).cast("long").alias("take"),
    ).orderBy("doc_id", "window_id")


def token_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    approx_rows: int | None = None,
    count_col: str | None = None,
) -> tuple[DataFrame, int]:
    """(frame, total_tokens): the global token-interval frame
    (doc_id, n_tok, start, end) in ``id_col`` order, built with the
    two-phase range-partitioned prefix sum (no single-partition global
    sort; see :func:`pack_concat_chunks` for the contract). The grand
    total falls out of the per-range subtotals already collected at
    the driver — no extra scan. Shared by concat-and-chunk packing and
    shard assignment.

    ``approx_rows`` sizes ``num_partitions`` and the boundary-sample
    rate without the sizing ``count()`` action (a rough estimate is
    fine — it only balances range sizes); omitted, one count runs.

    ``count_col`` swaps the whitespace token count for a precomputed
    per-doc length (e.g. BPE subword counts from
    :func:`swarm_spark.ops.bpe.bpe_token_counts`) — the packing
    arithmetic is length-agnostic, so a training pipeline budgets in
    REAL tokenizer units by passing the column instead of re-counting
    text."""
    spark = df.sparkSession
    ids = df.select(F.col(id_col).alias("doc_id"))
    n_docs = approx_rows if approx_rows is not None else ids.count()
    if num_partitions is None:
        # each range cumsums sequentially inside one window task: scale
        # the range count with the corpus (≤ ~2M rows per range), like
        # pack_greedy_bins sizes its buckets
        num_partitions = max(32, -(-n_docs // 2_000_000))
    target = num_partitions * 200  # ~200 sampled ids per range
    frac = min(1.0, target / max(n_docs, 1))
    cut = int(frac * (1 << 32))
    sample = sorted(
        r["doc_id"]
        for r in ids.where(hash_bucket("doc_id", "swarm-pack-bounds") < cut).collect()
    )
    step = max(1, len(sample) // num_partitions)
    bounds = sorted(set(sample[step - 1 :: step][: num_partitions - 1]))
    part = F.lit(0)
    for b in bounds:  # monotone in doc_id: range index = #boundaries passed
        part = part + (F.col("doc_id") > F.lit(b)).cast("int")
    n_tok = (
        F.col(count_col).cast("long")
        if count_col is not None
        else F.size(tokens_col(text_col)).cast("long")
    )
    counted = (
        df.select(F.col(id_col).alias("doc_id"), n_tok.alias("n_tok"))
        .where(F.col("n_tok") > 0)
        .withColumn("part", part)
    )
    wp = Window.partitionBy("part").orderBy("doc_id")
    local = counted.withColumn("local_end", F.sum("n_tok").over(wp))
    subtotals = {
        r["part"]: r["tot"]
        for r in counted.groupBy("part").agg(F.sum("n_tok").alias("tot")).collect()
    }
    running, offsets = 0, []
    for p in sorted(subtotals):  # ranges are monotone in id → id order
        offsets.append((p, running))
        running += subtotals[p]
    off_df = spark.createDataFrame(offsets, "part int, part_off long")
    base = (
        local.join(F.broadcast(off_df), "part")
        .withColumn("end", F.col("part_off") + F.col("local_end"))
        .withColumn("start", F.col("end") - F.col("n_tok"))
    )
    return base, int(running)


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Balanced training-shard assignment: documents keep their
    boundaries and land in the shard their global token interval
    STARTS in, with shard capacity ceil(total_tokens / n_shards) —
    every shard's token count is within one document of the target,
    deterministically (a pure function of the corpus and n_shards).
    Output (doc_id, n_tok, shard). Partition the write by ``shard``
    for the training-export layout.

    Scale shape: the same two-phase prefix sum as concat-and-chunk
    packing (:func:`token_prefix`) plus one codegen projection — no
    extra shuffle, no skew (shards are token-balanced by
    construction).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    base, total = token_prefix(df, text_col, id_col, num_partitions, approx_rows)
    cap = max(1, -(-total // int(n_shards)))
    return base.select(
        "doc_id",
        "n_tok",
        F.expr(f"start div {cap}").cast("long").alias("shard"),
    ).orderBy("doc_id")


def pack_greedy_bins(
    df: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    seed: str = "swarm-pack",
    max_bucket_rows: int = 2_000_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """First-fit-sequential bin packing without document splitting.

    Documents hash into ``num_buckets`` deterministic packing groups;
    within a group they pack in ``id_col`` order: a bin closes when
    the next document would overflow ``capacity``. Oversized documents
    (n_tok > capacity) occupy a bin alone with ``oversize=true``.

    Each bucket packs sequentially inside ONE ``applyInPandas`` group
    (rows are 3 longs + a bool), so bucket size must scale with the
    corpus. ``num_buckets=None`` (the default) auto-derives it from a
    cheap row count — parquet sources answer count() from footer
    metadata — targeting ≤ ``max_bucket_rows`` expected rows per bucket
    (md5 bucketing is balanced, so expectation ≈ bound). An EXPLICIT
    ``num_buckets`` that would put more than ``max_bucket_rows``
    expected rows in a bucket raises instead of silently building an
    operator that OOMs one task at scale.

    Output: (doc_id, n_tok, bucket, bin_id, fill, oversize) where
    ``fill`` is the bin's running fill AFTER this document and
    ``bin_id`` is local to the bucket ((bucket, bin_id) is the global
    bin key).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    # approx_rows skips the sizing count() (see token_prefix) — the
    # bucket count and the overload guard both only need the order of
    # magnitude
    n_rows = approx_rows if approx_rows is not None else df.count()
    if num_buckets is None:
        num_buckets = max(16, -(-n_rows // max_bucket_rows))
    elif n_rows > num_buckets * max_bucket_rows:
        raise ValueError(
            f"num_buckets={num_buckets} puts ~{n_rows // num_buckets} rows "
            f"in each sequential packing bucket (cap {max_bucket_rows}); "
            f"raise num_buckets to >= {-(-n_rows // max_bucket_rows)} or "
            "raise max_bucket_rows explicitly"
        )
    base = (
        df.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("ws"))
        .select("doc_id", F.size("ws").cast("long").alias("n_tok"))
        .where(F.col("n_tok") > 0)
        .withColumn(
            "bucket", (hash_bucket("doc_id", seed) % num_buckets).cast("int")
        )
    )
    cap = int(capacity)

    # nested so cloudpickle ships it by value (workers don't have
    # swarm_spark on their path under the grading session)
    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills, overs = [], [], []
        bin_id, fill = -1, cap  # force a new bin for the first doc
        for n in pdf["n_tok"]:
            if fill + n <= cap:
                fill += n
            else:
                bin_id += 1
                fill = n
            bins.append(bin_id)
            fills.append(fill)
            overs.append(bool(n > cap))
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tok": pdf["n_tok"],
                "bucket": pdf["bucket"],
                "bin_id": pd.Series(bins, dtype="int64"),
                "fill": pd.Series(fills, dtype="int64"),
                "oversize": pd.Series(overs, dtype="bool"),
            }
        )

    id_type = dict(df.dtypes)[id_col]  # preserve non-long id columns
    out_schema = (
        f"doc_id {id_type}, n_tok long, bucket int, "
        "bin_id long, fill long, oversize boolean"
    )
    return (
        base.groupBy("bucket")
        .applyInPandas(_pack, out_schema)
        .orderBy("doc_id")
    )
