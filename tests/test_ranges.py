"""Deterministic range bucketing / prefix sums (operators/ranges.py).

Regression for the r2 pack_shards hash mismatch: the old
repartitionByRange + spark_partition_id pattern could assign inconsistent
partition ids to the window branch vs the offsets branch when the exchange
re-executed (AQE replan / retry). The replacement derives bucket ids from
row CONTENT, so the result must be bit-identical under any
shuffle-partition setting, AQE on/off, and input partitioning.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nlp_cube_spark.operators import ranges as R
from nlp_cube_spark.operators.sampling import pack_by_budget
from nlp_cube_spark.operators.vocab import word_vocab


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").localCheckpoint()


def _expected_pack(docs_pdf: pd.DataFrame, budget: int) -> dict:
    pre = 0
    out = {}
    for _, row in docs_pdf.sort_values("doc_id").iterrows():
        out[row.doc_id] = pre // budget
        pre += row.n_chars
    return out


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return _docs(spark).select("doc_id", "n_chars").toPandas()


def test_pack_by_budget_identical_across_shuffle_settings(spark, docs_pdf):
    """The verdict-mandated regression: >=3 shuffle-partition settings in
    the shared session must all reproduce the eager oracle exactly."""
    expected = _expected_pack(docs_pdf, 1500)
    docs = _docs(spark)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            got = {
                r.doc_id: r.shard
                for r in pack_by_budget(docs, "n_chars", 1500, order_col="doc_id").collect()
            }
            assert got == expected, f"mismatch at shuffle.partitions={n}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_pack_by_budget_identical_under_aqe_toggle_and_repartition(spark, docs_pdf):
    expected = _expected_pack(docs_pdf, 2000)
    docs = _docs(spark)
    before = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            got = {
                r.doc_id: r.shard
                for r in pack_by_budget(
                    docs.repartition(13), "n_chars", 2000, order_col="doc_id"
                ).collect()
            }
            assert got == expected, f"mismatch at aqe={aqe}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)


def test_exclusive_prefix_sum_matches_global_window(spark):
    """Property vs the single-task reference form, several bucket counts
    (1 bucket = degenerate, n_buckets > n rows = one row per bucket)."""
    df = (
        spark.range(0, 197)
        .withColumn("k", F.concat(F.lit("id"), F.format_string("%03d", F.col("id"))))
        .withColumn("v", (F.col("id") * 7 + 3) % 23)
        .localCheckpoint()
    )
    expected = {
        r.k: r.pre
        for r in df.selectExpr(
            "k",
            "coalesce(sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre",
        ).collect()
    }
    for nb in (1, 4, 300):
        got = {
            r.k: r._pre
            for r in R.exclusive_prefix_sum(df, [F.col("k")], "v", n_buckets=nb).collect()
        }
        assert got == expected, f"n_buckets={nb}"


def test_with_range_pid_monotone_and_content_derived(spark):
    df = spark.range(0, 500).withColumn("v", F.col("id")).localCheckpoint()
    out = R.with_range_pid(df, [F.col("v")], n_buckets=8).collect()
    by_v = sorted((r.v, r._pid) for r in out)
    pids = [p for _, p in by_v]
    assert pids == sorted(pids), "bucket ids must be monotone in sort order"
    assert len(set(pids)) > 1, "expected multiple buckets at 500 rows"
    # content-derived: identical assignment from a different partitioning
    out2 = {r.v: r._pid for r in R.with_range_pid(df.repartition(17), [F.col("v")], n_buckets=8).collect()}
    assert out2 == dict(by_v)


def test_empty_and_single_row_inputs(spark):
    empty = spark.range(0).withColumn("v", F.col("id"))
    assert R.exclusive_prefix_sum(empty, [F.col("id")], "v").count() == 0
    one = spark.range(1).withColumn("v", F.lit(5))
    rows = R.exclusive_prefix_sum(one, [F.col("id")], "v").collect()
    assert len(rows) == 1 and rows[0]._pre == 0


def test_vocab_rank_ids_stable_across_shuffle_settings(spark):
    docs = _docs(spark)
    toks = docs.select(F.explode(F.split("text", " ")).alias("form")).where(F.col("form") != "")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for n in ("1", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(sorted((r.word, r["count"], r.id) for r in word_vocab(toks).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert results[0] == results[1]
    # ids match the global (count desc, word asc) order
    ordered = sorted(results[0], key=lambda t: (-t[1], t[0]))
    assert [t[2] for t in ordered] == list(range(len(ordered)))
