#!/usr/bin/env python
"""Phase attribution for kg_build_graph (VERDICT r6 item 1 follow-up):
time each stage of plans/pipeline.build_graph separately at sf0.1 so a
total-time swing can be pinned to a phase instead of guessed at.
Mirrors build_graph's exact actions in order.

    python scripts/profile_build_graph.py [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as E
from nlp_cube_spark.datagen import aliases_df
from nlp_cube_spark.operators import annotate as A
from nlp_cube_spark.operators import canonicalize as C
from nlp_cube_spark.operators import linking as LK
from nlp_cube_spark.plans.pipeline import read_canonical_triples, with_bucket
from nlp_cube_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-build-graph", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    pages = E._docs_as_pages(spark, sf_dir)
    # warm python workers (bench.py discipline)
    A.fused_triples(pages.limit(512).repartition(64)).write.format("noop").mode(
        "overwrite"
    ).save()
    aliases = aliases_df(spark)
    n_buckets = 32

    best: dict[str, float] = {}
    for _ in range(args.runs):
        out = tempfile.mkdtemp(prefix="prof_kg_")
        phases: dict[str, float] = {}

        t = time.time()
        pages_b = with_bucket(pages, n_buckets)
        triples = A.fused_triples(pages_b).localCheckpoint()  # eager: runs now
        phases["annotate_fused_ckpt"] = time.time() - t

        t = time.time()
        linked = LK.link_triples(triples, aliases)
        out_df = with_bucket(linked, n_buckets).withColumn(
            "conf",
            F.when(
                F.col("subj_id").isNotNull() & F.col("obj_id").isNotNull(), F.lit(1.0)
            ).otherwise(F.lit(0.8)),
        )
        out_df.repartition("bucket").write.partitionBy("bucket").mode("overwrite").parquet(
            f"{out}/triples"
        )
        phases["link_and_bucketed_write"] = time.time() - t

        t = time.time()
        full = (
            spark.read.parquet(f"{out}/triples")
            .select("subj", "obj", "pattern", "subj_id", "obj_id")
            .localCheckpoint()
        )
        C.canonical_entities(full).write.mode("overwrite").parquet(f"{out}/entities")
        phases["canonicalize_cc"] = time.time() - t

        t = time.time()
        spark.read.parquet(f"{out}/triples").groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_triples")
        ).withColumn("run_id", F.lit(0)).write.mode("overwrite").parquet(
            f"{out}/_metrics_buckets"
        )
        ct = read_canonical_triples(spark, out)
        nodes = (
            ct.select(F.col("subj_canon").alias("node"))
            .unionByName(ct.select(F.col("obj_canon").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        nodes.write.mode("overwrite").parquet(f"{out}/nodes")
        phases["metrics_nodes_writes"] = time.time() - t

        phases["total"] = sum(phases.values())
        for k, v in phases.items():
            best[k] = min(best.get(k, float("inf")), round(v, 3))
        shutil.rmtree(out, ignore_errors=True)

    print(json.dumps({"metric": "build_graph_phases_sec", "sf_dir": sf_dir, **best}))
    spark.stop()


if __name__ == "__main__":
    main()
