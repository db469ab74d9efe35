#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

Cluster usage (the north-rule invocation):

    zip -r nlp_cube_spark.zip nlp_cube_spark
    spark-submit --py-files nlp_cube_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        scripts/run_pipeline.py \\
        --pages <pages parquet/iceberg path> --out <graph dir> \\
        [--n-buckets 4096] [--resume]

Local demo (what this sandbox runs): omit --pages to use the seeded
fixture generator. Prints one JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None, help="input pages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--n-fixture-docs", type=int, default=1000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--run-id", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("nlp_cube_spark-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # when launched via spark-submit --py-files the package is already on
    # executors; when launched bare, ship it ourselves
    try:
        from nlp_cube_spark.session import _ship_package

        _ship_package(spark)
    except Exception:
        pass

    from nlp_cube_spark.datagen import aliases_df, pages_df
    from nlp_cube_spark.plans.pipeline import build_graph

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        pages = pages_df(spark, args.n_fixture_docs, seed=42)

    metrics = build_graph(
        spark,
        pages,
        aliases_df(spark),
        args.out,
        n_buckets=args.n_buckets,
        resume=args.resume,
        run_id=args.run_id,
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
