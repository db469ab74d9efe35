"""Composed training-data prep plan (plans/dataprep.py)."""

from pyspark.sql import functions as F

from nlp_cube_spark.plans.dataprep import prep_training_data


def test_prep_removes_dups_and_packs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant one exact dup and one near dup of doc 0
    d0 = docs.where(F.col("doc_id") == 0)
    exact = d0.withColumn("doc_id", F.lit(900001))
    near = d0.withColumn("doc_id", F.lit(900002)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" x"))
    ).withColumn("n_chars", F.col("n_chars") + 2)
    all_docs = docs.unionByName(exact).unionByName(near).localCheckpoint()

    out = prep_training_data(all_docs).cache()
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 0 in ids  # the original survives (smallest doc_id of its cluster)
    assert 900001 not in ids  # exact dup removed
    assert 900002 not in ids  # near dup removed
    # splits partition the survivors; shards are contiguous from 0 per split
    rows = out.collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    for s in {r.split for r in rows}:
        shards = sorted({r.shard for r in rows if r.split == s})
        assert shards == list(range(len(shards)))
    # determinism across shuffle-partition settings
    out2 = {tuple(r) for r in prep_training_data(all_docs.repartition(7)).collect()}
    assert out2 == {tuple(r) for r in rows}
    # no cartesian anywhere in the composed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
