"""Skew handling: hot-key detection + salted two-phase aggregation/join.

Web-scale predicate/entity keys are Zipfian (north rule requires explicit
skew handling). AQE's skew-join splitting is enabled globally
(session.py); this module adds the aggregation-side tools:

- `hot_keys`: find keys above a frequency threshold (one cheap partial-agg
  count — at 100 TB run it on a sample via `df.sample` first);
- `salted_agg_count`: two-phase count — phase 1 groups on (key, salt) so a
  hot key fans out over `n_salt` reducers, phase 2 sums the partials. For
  algebraic aggregates Spark's own partial aggregation usually suffices;
  salting matters when the *reduce side* (e.g. collect_list / distinct per
  key) would otherwise concentrate on one task.
- `with_salt`: generic salt column for pre-shuffle fan-out joins (replicate
  the small side n_salt times, salt the big side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, key: str, n_salt: int = 16, col: str = "salt") -> DataFrame:
    """Deterministic, rerun-stable salt: xxhash64 over every column EXCEPT
    `key` (the payload). Content-derived, so it is stable under
    repartitioning and task retry (monotonically_increasing_id /
    spark_partition_id are not), and excluding the key makes the intent
    honest: within one hot key the spread comes entirely from payload
    variety.

    LIMITATION (by construction of any content-derived salt): rows whose
    payload columns are bitwise-identical land in the same salt bucket, so
    a hot key consisting of verbatim-duplicated rows does NOT spread. Such
    duplicates are exact-dedup territory (operators/dedup.exact_duplicates)
    — dedup or pre-aggregate before salting; a row_number-style
    disambiguator would reintroduce the partition-identity nondeterminism
    this module exists to avoid. Degenerate single-column frames (payload
    empty) fall back to hashing the key, i.e. no spread."""
    payload = [c for c in df.columns if c != key] or [key]
    return df.withColumn(col, F.pmod(F.xxhash64(*[F.col(c) for c in payload]), F.lit(n_salt)))


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    return df.groupBy(key).count().where(F.col("count") >= min_count).select(key)


def sampled_hot_keys(
    df: DataFrame, key: str, min_count: int, sample_cols: list[str],
    sample_mod: int = 10,
) -> DataFrame:
    """Sketch-style hot-key detection WITHOUT a full first-pass aggregation.

    `hot_keys` is itself a full shuffle+agg over the fact table — at 100 TB
    that is the cost you were trying to avoid. This estimates key frequency
    on a deterministic 1/sample_mod row sample (md5 of `sample_cols`, so the
    sample is content-derived: rerun-stable AND replayable by a SQL oracle,
    unlike df.sample's partition-order-dependent RNG) and scales the
    threshold. The scan stays narrow (key + sample cols), the shuffle
    carries ~1/sample_mod of the rows. Returns (key, est_count).

    Estimation error ~ sqrt(mod/true_count): choose sample_mod so hot keys
    still land well above min_count/sample_mod in the sample."""
    cat = " || ':' || ".join(f"cast({c} as string)" for c in sample_cols)
    h = f"cast(conv(substr(md5({cat}), 1, 15), 16, 10) as bigint)"
    sampled = df.where(F.expr(f"pmod({h}, {sample_mod}) = 0"))
    thresh = max(1, min_count // sample_mod)
    return (
        sampled.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= thresh)
        .select(key, (F.col("_n") * sample_mod).alias("est_count"))
    )


def approx_distinct_per_key(df: DataFrame, group: str, value: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct-cardinality per group (one pass, fixed-size
    sketch per key — the §2d approx-distinct surface). Use to find keys
    whose DISTINCT fan-out is hot (e.g. predicates with millions of distinct
    subjects) without the exact count-distinct's full dedup shuffle."""
    return df.groupBy(group).agg(
        F.approx_count_distinct(value, rsd=rsd).alias("approx_distinct")
    )


def salted_agg_count(df: DataFrame, key: str, n_salt: int = 16) -> DataFrame:
    """count per key via (key, salt) partial then final sum."""
    salted = with_salt(df, key, n_salt)
    partial = salted.groupBy(key, "salt").count()
    return partial.groupBy(key).agg(F.sum("count").alias("count"))


def salted_join(big: DataFrame, small: DataFrame, key: str, n_salt: int = 16) -> DataFrame:
    """Equi-join with manual hot-key fan-out: the big side gets a salt in
    [0, n_salt); the small side is replicated n_salt times so every salted
    partition finds its match. Use when one join key dominates (Zipf head)
    and AQE's skew splitting isn't available (e.g. broadcast not possible
    and the hot key exceeds a single task). Result == plain inner join."""
    salted_big = with_salt(big, key, n_salt)
    replicated = small.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))
    return salted_big.join(replicated, [key, "salt"]).drop("salt")


def salted_distinct_count(df: DataFrame, key: str, value: str, n_salt: int = 16) -> DataFrame:
    """distinct values per key with salted pre-dedup: dedup on
    (key, salt, value) spreads a hot key's dedup work across reducers,
    then the per-key distinct count is exact."""
    salted = with_salt(df, key, n_salt)
    pre = salted.dropDuplicates([key, "salt", value])
    # a value can survive in several salt buckets; final exact dedup is on
    # the (much smaller) pre-deduped stream
    return pre.dropDuplicates([key, value]).groupBy(key).agg(F.count(value).alias("n_distinct"))
