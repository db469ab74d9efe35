"""Graph analytics over the materialized KG (degree views exist as plain
aggregations; this adds PageRank).

pagerank() is classic synchronous power iteration, expressed so every
step is a uniform-key shuffle:

  contrib(v) = sum over edges u->v of rank(u) / out_deg(u)   (join + agg)
  rank'(v)   = (1-d)/N + d * (contrib(v) + dangling_mass/N)

Dangling nodes (no out-edges) redistribute their mass uniformly — the
standard stochastic-matrix completion, so total rank stays 1 every
iteration (asserted in tests). The iteration count is FIXED (default 3)
rather than convergence-tested: deterministic output, oracle-replayable
by an unrolled SQL CTE chain, and each iteration localCheckpoints so
the plan stays iteration-sized instead of growing exponentially (same
discipline as canonicalize.connected_components).

100 TB shape: ranks and degrees are node-dimension tables, edges shuffle
on src/dst (uniform unless the graph is skewed — salt hot entities with
operators/salting first); the two scalar aggregates per iteration
(node count, dangling mass) attach via broadcast cross join, never a
driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, pagerank) after `iters` synchronous iterations over the
    DISTINCT edge set. Double arithmetic is kept in the exact shape the
    DuckDB oracle replays: (1 - d)/N + d * (contrib + dangling/N)."""
    # lazy checkpoint: e is referenced by nodes/deg AND by every
    # iteration's contrib join — unmaterialized, an expensive upstream
    # plan (e.g. the fused triple kernel) would re-run once per iteration
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nd = (
        nodes.join(deg, nodes["node"] == deg["src"], "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    nc = nd.agg(F.count(F.lit(1)).alias("n"))
    ranks = nd.crossJoin(F.broadcast(nc)).select(
        "node", "deg", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iters):
        dang = ranks.where(F.col("deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nd.crossJoin(F.broadcast(nc))
            .crossJoin(F.broadcast(dang))
            .join(contrib, nd["node"] == contrib["dst"], "left")
            .select(
                "node",
                "deg",
                (
                    (1 - damping) / F.col("n")
                    + damping * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.col("n"))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank")

def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph induced
    by `edges` (direction dropped, self-loops and duplicate/reversed
    edges collapsed) — GraphFrames' triangleCount semantics.

    Plan: canonical a<b edge set -> wedge join (x<y<z, so each triangle
    is enumerated exactly once) -> closing-edge join -> explode the 3
    corners -> one hash agg. Two equi-joins on node keys; at web scale
    compose with operators/salting for power-law hubs (the classic
    refinement — pivoting each triangle on its lowest-DEGREE vertex —
    plugs in by replacing the a<b canonical order with a degree order).
    Returns (node, triangles) for EVERY node incident to an edge."""
    e = (
        edges.select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
        .localCheckpoint(eager=False)  # referenced 3x below
    )
    wedge = e.select(F.col("a").alias("x"), F.col("b").alias("y")).join(
        e.select(F.col("a").alias("y"), F.col("b").alias("z")), "y"
    )
    tri = wedge.join(e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"])
    corners = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .dropDuplicates()
    )
    return nodes.join(corners, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


class Graph:
    """GraphFrames-style facade over plain DataFrames (the north-star's
    "GraphFrames-style edge DataFrame" without the external package):
    `edges` must carry (src, dst); `vertices` (id, ...) is derived from
    the edge endpoints when not supplied. Every method returns a
    DataFrame and composes with the rest of the engine."""

    def __init__(self, edges: DataFrame, vertices: DataFrame | None = None):
        if "src" not in edges.columns or "dst" not in edges.columns:
            raise ValueError("edges must have src and dst columns")
        self.edges = edges
        self._vertices = vertices

    @property
    def vertices(self) -> DataFrame:
        if self._vertices is not None:
            return self._vertices
        return (
            self.edges.select(F.col("src").alias("id"))
            .union(self.edges.select(F.col("dst").alias("id")))
            .dropDuplicates()
        )

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_degree")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("in_degree")
        )

    def degrees(self) -> DataFrame:
        both = self.edges.select(F.col("src").alias("id")).union(
            self.edges.select(F.col("dst").alias("id"))
        )
        return both.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))

    def page_rank(self, iters: int = 3, damping: float = 0.85) -> DataFrame:
        return pagerank(self.edges, iters=iters, damping=damping)

    def connected_components(self, max_iter: int = 15) -> DataFrame:
        from .canonicalize import connected_components

        return connected_components(self.edges, max_iter=max_iter)

    def triangle_count(self) -> DataFrame:
        return triangle_count(self.edges)
