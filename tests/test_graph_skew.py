"""Skew stress for the graph family (r6 verdict item 7): the operators
must converge on a Zipfian graph whose hubs are ~1000x the median degree
— the regime where a naive wedge/join formulation blows up.  The timed
full-size (1M-edge) run with per-stage straggler ratios lives in
scripts/bench_graph_skew.py (BENCH/r7/NOTES.md records the numbers);
this test runs the same shape at 200k edges inside the shared session
and asserts convergence + structural invariants in bounded time."""

import time

from pyspark.sql import functions as F

from nlp_cube_spark.datagen import zipf_edges
from nlp_cube_spark.operators import graphstats as G

WALL_CEILING = 240  # generous (contended-host-safe); a cartesian would blow it


def test_graph_family_on_zipfian_hubs(spark):
    edges = zipf_edges(spark, 200_000, n_nodes=20_000, n_hubs=10).localCheckpoint()
    deg = edges.select(F.col("src").alias("n")).unionAll(
        edges.select(F.col("dst").alias("n"))
    ).groupBy("n").count()
    hi, med = deg.selectExpr(
        "max(count)", "percentile_approx(count, 0.5)"
    ).first()
    assert hi >= 100 * med, (hi, med)  # the skew is really there

    t0 = time.time()
    core = G.k_core(edges, k=3)
    nodes = {r.node for r in core.collect()}
    assert nodes, "3-core empty"
    assert all(h in nodes for h in range(10)), "hubs must survive 3-core peeling"

    truss = G.k_truss(edges, t=3)
    assert truss.count() > 0

    lpa = G.label_propagation(edges, iters=2)
    n_nodes = edges.selectExpr("src as n").unionAll(
        edges.selectExpr("dst as n")
    ).distinct().count()
    assert lpa.count() == n_nodes  # every node labeled exactly once

    h = G.hits(edges, iters=2)
    # hubs of the Zipf graph dominate the authority/hub mass; L2 norms ~1
    sq = h.selectExpr(
        "round(sum(authority * authority), 3) as sa",
        "round(sum(hub * hub), 3) as sh",
    ).first()
    assert abs(sq.sa - 1.0) < 0.01 and abs(sq.sh - 1.0) < 0.01, sq
    # the Zipf hubs are out-degree hubs: they must top the HITS hub
    # score (their dsts spread authority thin, so check the hub side)
    top_hub = h.orderBy(F.desc("hub")).first()
    assert top_hub.node < 10, top_hub

    wall = time.time() - t0
    assert wall < WALL_CEILING, f"graph family took {wall:.0f}s on 200k edges"
