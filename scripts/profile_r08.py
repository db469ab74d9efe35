#!/usr/bin/env python
"""r8 optimization-round profiler: per-query noop-isolated timings +
explain('formatted') capture for the headline bench queries.

Usage:
    python scripts/profile_r08.py [--sf-dir DIR] [--runs N] [--plans-dir DIR]
        [--queries q1,q2,...] [--no-plans]

Writes plans to <plans-dir>/<query>_<tag>.txt (tag: before/after) and
prints one JSON line of min-of-N timings. Separate from bench.py (frozen
for driver measurement) per the optimization-round rules.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from nlp_cube_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "window_top3",
    "events_hourly",
    "salted_supplier_counts",
    "doc_fingerprints",
    "doc_quality",
    "simhash_signatures",
    "training_data_prep",
    "ann_cosine_topk",
    "kg_upos_distribution",
    "kg_triples",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--build-graph", action="store_true", help="also time kg_build_graph")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="profile_r08", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm python task slots exactly like bench.py
    from nlp_cube_spark.operators import annotate as _A

    warm = E._docs_as_pages(spark, args.sf_dir).limit(int(cpus) * 16).repartition(int(cpus) * 2)
    materialize(_A.fused_triples(warm))

    names = args.queries.split(",") if args.queries else HEADLINE
    qs = E.queries()
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        df = qs[name](spark, args.sf_dir)
        if args.plans_dir and not args.no_plans:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        best, ss = float("inf"), []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"r08 profile: {name}")
            t0 = time.time()
            materialize(qs[name](spark, args.sf_dir))
            dt = time.time() - t0
            ss.append(round(dt, 3))
            best = min(best, dt)
        timings[name] = round(best, 3)
        samples[name] = ss
        print(f"# {name}: min {timings[name]}  samples {ss}", file=sys.stderr)

    if args.build_graph:
        import shutil
        import tempfile

        from nlp_cube_spark.datagen import aliases_df
        from nlp_cube_spark.plans import pipeline as P

        pages = E._docs_as_pages(spark, args.sf_dir)
        n_docs = pages.count()
        best, ss = float("inf"), []
        for _ in range(args.runs):
            out = tempfile.mkdtemp(prefix="prof_kg_")
            spark.sparkContext.setJobDescription("r08 profile: kg_build_graph")
            t0 = time.time()
            P.build_graph(spark, pages, aliases_df(spark), out, n_buckets=int(cpus), resume=False)
            dt = time.time() - t0
            ss.append(round(dt, 3))
            best = min(best, dt)
            shutil.rmtree(out, ignore_errors=True)
        timings["kg_build_graph"] = round(best, 3)
        samples["kg_build_graph"] = ss
        print(f"# kg_build_graph: min {timings['kg_build_graph']}  samples {ss}  n_docs {n_docs}", file=sys.stderr)

    print(json.dumps({"sf_dir": args.sf_dir, "timings": timings, "samples": samples, "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
