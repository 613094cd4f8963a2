"""Scale-oriented join helpers: bucketed co-location and skew salting.

Two standard 100-TB techniques packaged as utilities (SCALING.md):

- :func:`write_bucketed` / :func:`bucketed_join` — pre-bucket both
  sides of a recurring join key with ``bucketBy`` so later equi-joins
  read co-located buckets and skip the shuffle entirely (verified in
  tests by asserting the physical plan has no Exchange).
- :func:`salted_join` — explode a hot build-side key into ``salt_n``
  replicas and scatter the probe side uniformly across them, turning
  one straggler partition into ``salt_n`` even ones. AQE's skew-join
  handles moderate skew automatically; salting is for the pathological
  key that exceeds a single executor regardless of split size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_COL = "__swarm_salt"


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``key`` into the session catalog.

    Joins between tables bucketed on the same key with the same bucket
    count are planned WITHOUT a shuffle (SortMergeJoin over co-located
    buckets).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on ``key``.

    The (small-ish) right side is replicated ``salt_n`` times with a
    salt column; each left row picks one replica pseudo-randomly but
    deterministically (hash of the key + a per-row uniform component),
    so a single hot key spreads over ``salt_n`` reducers. Result equals
    the plain join (the salt is internal).

    Only left-preserving modes are supported: the right side is
    replicated ``salt_n`` times, so right/full outer would emit every
    unmatched right row once per replica.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, got {how!r}: "
            "right-side replication breaks right/full outer semantics"
        )
    salted_right = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    salted_left = left.withColumn(
        SALT_COL,
        F.pmod(F.hash(F.col(key), F.monotonically_increasing_id()), F.lit(salt_n)).cast(
            "int"
        ),
    )
    out = salted_left.join(salted_right, on=[key, SALT_COL], how=how)
    return out.drop(SALT_COL)
