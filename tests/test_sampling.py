"""Deterministic sampling/split/packing operators."""

from pyspark.sql import functions as F

from nlp_cube_spark.operators import sampling as SP


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").localCheckpoint()


def test_hash_sample_stable_under_repartition(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in SP.hash_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in SP.hash_sample(docs.repartition(13), "doc_id", 0.3).select("doc_id").collect()}
    assert a == b and 0.15 < len(a) / docs.count() < 0.45


def test_hash_split_disjoint_exhaustive_and_stable_under_growth(spark):
    docs = _docs(spark)
    full = {r.doc_id: r.split for r in SP.hash_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}).collect()}
    assert set(full.values()) == {"train", "val", "test"}
    assert len(full) == docs.count()
    # growth stability: the split of an existing doc never changes when the
    # corpus shrinks/grows (assignment is a pure function of the key)
    half = docs.where("doc_id % 2 = 0")
    part = {r.doc_id: r.split for r in SP.hash_split(half, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}).collect()}
    assert all(full[k] == v for k, v in part.items())


def test_stratified_fractions_differ_by_stratum(spark):
    docs = _docs(spark)
    out = SP.stratified_hash_sample(docs, "lang", {"en": 0.8, "zh": 0.1}, key="doc_id", default=0.0)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("en", 0) / tot["en"] > 0.6
    assert got.get("zh", 0) <= tot["zh"] * 0.3
    assert set(got) <= {"en", "zh"}  # default 0.0 drops other strata


def test_pack_by_budget_invariants_and_no_global_sort(spark):
    docs = _docs(spark)
    packed = SP.pack_by_budget(docs, "n_chars", budget=1500, order_col="doc_id")
    rows = sorted((r.doc_id, r.shard, r.n_chars) for r in packed.collect())
    # shards are contiguous in doc order and monotone
    shards = [s for _, s, _ in rows]
    assert shards == sorted(shards)
    # every shard's EXCLUSIVE prefix start lies in [shard*budget, (shard+1)*budget)
    pre = 0
    for _, s, n in rows:
        assert s == pre // 1500
        pre += n
    # plan: the data-sized window is hash-partitioned on the content-derived
    # bucket id (only the #buckets-row offsets dimension may pass through a
    # SinglePartition exchange); no range exchange, no spark_partition_id
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    assert "SPARK_PARTITION_ID" not in plan.upper()


def test_passage_chunks_overlap_and_tail(spark):
    """10 tokens, size 4, stride 3: starts at 1,4,7,10 — the last chunk
    is the single tail token; overlap = 1 token between neighbors;
    every token appears in at least one chunk; empty doc -> no rows."""
    text = " ".join(f"t{i}" for i in range(1, 11))
    docs = spark.createDataFrame([(1, text), (2, ""), (3, "a b")],
                                 "doc_id long, text string")
    rows = SP.passage_chunks(docs, size=4, stride=3).collect()
    d1 = sorted((r.chunk_id, r.start_token, r.n_tokens, r.passage)
                for r in rows if r.doc_id == 1)
    assert d1 == [
        (0, 1, 4, "t1 t2 t3 t4"),
        (1, 4, 4, "t4 t5 t6 t7"),
        (2, 7, 4, "t7 t8 t9 t10"),
        (3, 10, 1, "t10"),
    ]
    assert not [r for r in rows if r.doc_id == 2]
    d3 = [r for r in rows if r.doc_id == 3]
    assert len(d3) == 1 and d3[0].passage == "a b"
    # reconstruction invariant: the first `stride` tokens of each chunk,
    # concatenated in order, rebuild the document
    recon = [t for _, _, _, p in d1 for t in p.split(" ")[:3]]
    assert recon[: len(text.split())] == text.split()


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """Same input -> identical sample under repartitioning; a class
    with 100x the weight dominates the sample; zero/NULL weights are
    never drawn; exactly k rows return."""
    rows = [(i, 1000.0 if i % 10 == 0 else 1.0) for i in range(1, 501)]
    rows += [(9001, 0.0), (9002, None)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    s1 = [r.doc_id for r in SP.weighted_sample(docs, 50, "w").collect()]
    s2 = [r.doc_id for r in SP.weighted_sample(docs.repartition(13), 50, "w").collect()]
    assert s1 == s2 and len(s1) == 50
    assert 9001 not in s1 and 9002 not in s1
    heavy = sum(1 for d in s1 if d % 10 == 0)
    assert heavy >= 40  # 50 heavy docs at 1000x vs 450 light at 1x
