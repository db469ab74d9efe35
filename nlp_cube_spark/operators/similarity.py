"""Similarity search over embedding columns (ARRAY<FLOAT>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline. Dot
  products via zip_with/aggregate (JVM, codegen); queries broadcast; top-k
  via window row_number (TakeOrderedAndProject-friendly per query).
- `ivf_topk`: the scale path — coarse quantization: assign every vector to
  its nearest of C centroids (broadcast), probe only the closest `nprobe`
  cells per query. At 100 TB the cell assignment is a narrow map stage and
  the probe is a semi-join on cell_id instead of a full scan.
- centroids come from a deterministic sample (no RNG: hash-ordered take).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

COS_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
    # nullif guards zero-norm vectors: ANSI mode (Spark 4 default) THROWS on
    # /0; NULL matches DuckDB's x/0.0 semantics, and a NULL cosine fails
    # every threshold/rank predicate instead of crashing the job
    " / nullif(sqrt(aggregate({a}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    " * sqrt(aggregate({b}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))), 0D)"
)


def _sum_unrolled(terms: list[str]) -> str:
    """0D + t0 + t1 + ... — the EXACT addition sequence of
    aggregate(..., 0D, (acc, v) -> acc + v) over the same terms (left-
    associated, 0D seed included so even the -0.0 corner is identical),
    but as a flat codegen'd expression instead of an interpreted HOF."""
    return "0D + " + " + ".join(terms)


def cosine_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", q_id_col: str = "q_id", vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query vector. queries: (q_id, embedding).

    `dim` (when the caller knows the fixed embedding width) switches the
    per-pair math from interpreted aggregate/zip_with HOFs to unrolled
    codegen'd expressions with the SAME IEEE operation order — bit-
    identical cos_sim — and hoists each side's norm out of the n x q pair
    scoring: vector norms are computed once per vector row and query
    norms once into the broadcast, instead of once per PAIR (the HOF form
    re-evaluated both norms for every (vector, query) combination).
    Arrays shorter than `dim` would throw on the index access (ANSI) —
    `dim` is the caller's assertion, exactly like the oracle's unrolled
    replay."""
    if dim is None:
        cos = F.expr(COS_EXPR.format(a="q_emb", b=vec_col))
        scored = (
            vectors.alias("v")
            .join(F.broadcast(queries.select(F.col(q_id_col), F.col(vec_col).alias("q_emb"))))
            .select(F.col(q_id_col), F.col(id_col), F.round(cos, 6).alias("cos_sim"))
        )
    else:
        def sq(col: str) -> str:
            return _sum_unrolled(
                [f"(cast({col}[{i}] as double) * cast({col}[{i}] as double))" for i in range(dim)]
            )

        dot = _sum_unrolled(
            [f"(cast(q_emb[{i}] as double) * cast({vec_col}[{i}] as double))" for i in range(dim)]
        )
        qs = queries.select(
            F.col(q_id_col),
            F.col(vec_col).alias("q_emb"),
            F.expr(f"sqrt({sq(vec_col)})").alias("_qn"),
        )
        vs = vectors.select(
            F.col(id_col), F.col(vec_col), F.expr(f"sqrt({sq(vec_col)})").alias("_vn")
        )
        # same value sequence as COS_EXPR: dot / nullif(sqrt(A)*sqrt(B), 0)
        cos = F.expr(f"({dot}) / nullif(_qn * _vn, 0D)")
        scored = (
            vs.join(F.broadcast(qs))
            .select(F.col(q_id_col), F.col(id_col), F.round(cos, 6).alias("cos_sim"))
        )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _seed_rows(vectors: DataFrame, n: int, id_col: str, vec_col: str) -> DataFrame:
    """The n vectors with the smallest md5-derived hash of their id,
    numbered centroid_id = 1..n in hash order (uniform pseudo-random,
    stable across runs and parallelism). THE one definition of seed
    selection — deterministic_centroids and pq_codebooks both build on
    it, and the DuckDB oracles replay it verbatim; two copies could
    drift and silently break an oracle."""
    return (
        vectors.select(id_col, vec_col)
        .withColumn("_h", F.expr(f"conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10)"))
        .orderBy("_h")
        .limit(n)
        .withColumn("centroid_id", F.expr("row_number() over (order by _h)"))
    )


def deterministic_centroids(vectors: DataFrame, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Pick C centroid vectors deterministically (see _seed_rows)."""
    return _seed_rows(vectors, n_centroids, id_col, vec_col).select(
        "centroid_id", F.col(vec_col).alias("c_emb")
    )


def ivf_assign(vectors: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast, argmax).

    argmax is a max_by aggregate keyed on the vector id, not a window: the
    n x C scored rows reduce map-side (partial aggregation) instead of
    sort-shuffling 16x the data just to keep row_number()=1. Ties break to
    the smallest centroid_id (struct max on (_sim, -centroid_id))."""
    cos = F.expr(COS_EXPR.format(a="c_emb", b=vec_col))
    scored = vectors.join(F.broadcast(centroids)).select(
        id_col, vec_col, "centroid_id", cos.alias("_sim")
    )
    rank_key = F.struct(F.col("_sim"), (-F.col("centroid_id")).alias("neg_cid"))
    return scored.groupBy(id_col).agg(
        F.max_by(F.col("centroid_id"), rank_key).alias("centroid_id"),
        F.first(vec_col).alias(vec_col),
    ).select(id_col, vec_col, "centroid_id")


# One embedding component quantized to integer nano-units: floor(x*1e9+0.5)
# is round-half-up built from ONLY exact-IEEE double ops (multiply, add,
# floor), so Spark and DuckDB produce the same integer bit-for-bit — the
# engine-portable rounding form from the weighted-sum lesson (CLAUDE.md).
NANO_EXPR = "cast(floor(cast({v} as double) * 1e9 + 0.5d) as bigint)"


def _nano_mean(val_col: str) -> F.Column:
    """Order-independent exact cell mean: SUM of per-element nano-unit
    BIGINTs (exact integer arithmetic — any summation order, any
    partitioning, any engine gives the same bits) divided back to double
    by one deterministic IEEE division. This is the integer-trajectory
    discipline proven on the LR/DSIR trainers (classifier.py, curate.py),
    closing the r5/r6 flake surface where round(avg(double)) could
    straddle a rounding boundary at an unlucky parallelism.

    Overflow bound: |component| <= 9.2 at 1e9 rows per cell (ANSI sum
    THROWS rather than wraps past 2^63) — at larger cells pre-aggregate
    per shard or drop to 1e6 units."""
    s = F.sum(F.expr(NANO_EXPR.format(v=val_col)))
    return s.cast("double") / (F.count(F.lit(1)).cast("double") * F.lit(1e9))


def kmeans_refine(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement of the deterministic seed centroids —
    the training half of the IVF index (seed -> assign -> recenter,
    `iters` times). Returns (centroid_id, c_emb: array<double>).

    Per iteration: broadcast cosine argmax assignment (ivf_assign) ->
    element-wise mean per cell via posexplode + one (cell, dim) hash agg
    -> re-assembled with array_sort(collect_list(struct(pos, m))). The
    corpus is scanned once per iteration and never shuffled wider than
    (n_centroids x dim) rows. Cell means accumulate as integer
    nano-units (_nano_mean) so the whole training trajectory is
    bit-identical across engines, partitionings and summation orders —
    no rounding anywhere in the loop; empty cells keep their previous
    centroid (the standard Lloyd degenerate-cell rule). localCheckpoint
    bounds the plan per iteration like pagerank."""
    cents = (
        deterministic_centroids(vectors, n_centroids, id_col, vec_col)
        .select("centroid_id", F.col("c_emb").cast("array<double>").alias("c_emb"))
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        assigned = ivf_assign(vectors, cents, id_col, vec_col)
        means = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(_nano_mean("val").alias("m"))
        )
        new = means.groupBy("centroid_id").agg(
            F.expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)").alias(
                "new_emb"
            )
        )
        cents = (
            cents.join(new, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new_emb"), F.col("c_emb")).alias("c_emb"),
            )
            .localCheckpoint(eager=False)
        )
    return cents


L2_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (cast(x as double) - cast(y as double))"
    " * (cast(x as double) - cast(y as double))), 0D, (acc, v) -> acc + v)"
)


def _subvectors(m: int, vec_col: str) -> F.Column:
    """ARRAY of m (sub_id, sub_emb) structs — contiguous equal slices of
    `vec_col` (dim is read per-row via size(), so callers never pass it;
    dim % m must be 0 or the tail dims silently drop — standard PQ
    precondition)."""
    d = f"(size({vec_col}) div {m})"
    return F.expr(
        f"transform(sequence(0, {m - 1}), j -> struct(j as sub_id, "
        f"transform(slice({vec_col}, j * {d} + 1, {d}), x -> cast(x as double)) as sub_emb))"
    )


def pq_codebooks(
    vectors: DataFrame, m: int = 4, ksub: int = 8, iters: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011, public
    knowledge): split every vector into m contiguous subvectors, train an
    independent ksub-centroid codebook per subspace — returns
    (sub_id, centroid_id, c_emb: array<double>).

    All m subspaces train in ONE Lloyd chain per iteration: the exploded
    (id, sub_id, sub_emb) table joins a BROADCAST codebook dimension,
    argmin-L2 assignment reduces map-side via max_by (never a window
    sort over the corpus), and the recenter agg is (m x ksub x subdim)
    rows. Seeds are the ksub hash-smallest vectors' subvectors (the
    deterministic_centroids discipline — same seed ids serve every
    subspace). Means accumulate as integer nano-units (_nano_mean) so
    the training trajectory is engine- and partitioning-portable with
    no rounding in the loop, and empty cells keep their previous
    centroid (kmeans_refine's degenerate-cell rule)."""
    seed_rows = _seed_rows(vectors, ksub, id_col, vec_col)
    cents = (
        seed_rows.select("centroid_id", F.explode(_subvectors(m, vec_col)).alias("s"))
        .select("s.sub_id", "centroid_id", F.col("s.sub_emb").alias("c_emb"))
        .localCheckpoint(eager=False)
    )
    subs = vectors.select(
        F.col(id_col), F.explode(_subvectors(m, vec_col)).alias("s")
    ).select(id_col, "s.sub_id", "s.sub_emb")
    dist = F.expr(L2_EXPR.format(a="c_emb", b="sub_emb"))
    for _ in range(iters):
        scored = subs.join(F.broadcast(cents), "sub_id").select(
            id_col, "sub_id", "sub_emb", "centroid_id", dist.alias("_d")
        )
        rank_key = F.struct((-F.col("_d")).alias("neg_d"), (-F.col("centroid_id")).alias("neg_cid"))
        assigned = scored.groupBy(id_col, "sub_id").agg(
            F.max_by("centroid_id", rank_key).alias("centroid_id"),
            F.first("sub_emb").alias("sub_emb"),
        )
        means = (
            assigned.select("sub_id", "centroid_id", F.posexplode("sub_emb").alias("pos", "val"))
            .groupBy("sub_id", "centroid_id", "pos")
            .agg(_nano_mean("val").alias("mval"))
        )
        new = means.groupBy("sub_id", "centroid_id").agg(
            F.expr("transform(array_sort(collect_list(struct(pos, mval))), x -> x.mval)").alias(
                "new_emb"
            )
        )
        cents = (
            cents.join(new, ["sub_id", "centroid_id"], "left")
            .select(
                "sub_id",
                "centroid_id",
                F.coalesce("new_emb", "c_emb").alias("c_emb"),
            )
            .localCheckpoint(eager=False)
        )
    return cents


def pq_encode(
    vectors: DataFrame, codebooks: DataFrame, m: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, sub_id, code): each subvector's argmin-L2 codebook entry —
    the m-byte-per-vector compressed representation. Broadcast codebook
    join + map-side max_by, exactly the ivf_assign shape."""
    subs = vectors.select(
        F.col(id_col), F.explode(_subvectors(m, vec_col)).alias("s")
    ).select(id_col, "s.sub_id", "s.sub_emb")
    dist = F.expr(L2_EXPR.format(a="c_emb", b="sub_emb"))
    scored = subs.join(F.broadcast(codebooks), "sub_id").select(
        id_col, "sub_id", "centroid_id", dist.alias("_d")
    )
    rank_key = F.struct((-F.col("_d")).alias("neg_d"), (-F.col("centroid_id")).alias("neg_cid"))
    return scored.groupBy(id_col, "sub_id").agg(
        F.max_by("centroid_id", rank_key).alias("code")
    )


def pq_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5, m: int = 4, ksub: int = 8,
    iters: int = 1, id_col: str = "vec_id", q_id_col: str = "q_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None, codes: DataFrame | None = None,
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance (ADC): per query,
    an (m x ksub)-entry distance table against the codebooks; each
    database vector's approximate distance = sum over its m codes of the
    table entries — the scan never touches raw vectors again, only the
    m-byte codes. Returns (q_id, vec_id, approx_dist, rank).

    100 TB shape: codebooks and distance tables are broadcast dimensions
    (m*ksub*queries rows); the scoring stage is a hash agg over
    (codes x queries) rows carrying one BIGINT each. Distance-table
    entries quantize to integer nano-units and the m-way per-candidate
    sum is exact integer arithmetic (any order, any engine); the final
    6dp floor re-quantization happens once, after the sum, before
    ranking (ties break on vec_id). Codebooks come from the exact
    nano-unit Lloyd trajectory (_nano_mean) — the whole index-train +
    search path has no summation-order surface left.

    Operationally the index trains ONCE and serves many query batches:
    pass `codebooks` (from pq_codebooks, e.g. read back from parquet)
    and optionally `codes` (from pq_encode) to skip retraining /
    re-encoding; omitted, both are derived inline."""
    books = (
        codebooks
        if codebooks is not None
        else pq_codebooks(vectors, m=m, ksub=ksub, iters=iters, id_col=id_col, vec_col=vec_col)
    )
    if codes is None:
        codes = pq_encode(vectors, books, m=m, id_col=id_col, vec_col=vec_col)
    qsubs = queries.select(
        F.col(q_id_col), F.explode(_subvectors(m, vec_col)).alias("s")
    ).select(q_id_col, "s.sub_id", F.col("s.sub_emb").alias("q_sub"))
    dist = F.expr(L2_EXPR.format(a="c_emb", b="q_sub"))
    # ADC entries quantize to integer NANO-units so the m-way sum is
    # exact at any aggregation order (the r7 trajectory discipline —
    # previously this summed m rounded doubles, a residual straddle
    # surface); one floor re-quantization to 6dp after the exact sum
    dtab = qsubs.join(F.broadcast(books), "sub_id").select(
        q_id_col,
        "sub_id",
        F.col("centroid_id").alias("code"),
        F.floor(dist * F.lit(1e9) + F.lit(0.5)).cast("bigint").alias("_dn"),
    )
    scored = (
        codes.join(F.broadcast(dtab), ["sub_id", "code"])
        .groupBy(q_id_col, id_col)
        .agg(F.sum("_dn").alias("_sn"))
        .select(
            q_id_col,
            id_col,
            (
                F.floor(
                    (F.col("_sn").cast("double") / F.lit(1e9)) * F.lit(1e6)
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("approx_dist"),
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(F.asc("approx_dist"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def hyperplane_sig_expr(vec_col: str, dim: int, n_planes: int) -> str:
    """SRP-LSH signature as a bit-string column expression.

    Plane k's components are md5-derived rationals in [-0.5, 0.5):
    h_k[i] = md5_60('h{k}:{i}') / 2^60 - 0.5 — deterministic, engine-
    portable (the DuckDB oracle rebuilds identical planes), no RNG. Sign
    of <v, h_k> gives bit k. Pure Catalyst: the signature is a narrow
    map-side projection like the MinHash signature."""
    bits = []
    for k in range(n_planes):
        h = (
            f"transform(sequence(0, {dim - 1}), i -> "
            f"cast(conv(substr(md5(concat('h{k}:', cast(i as string))), 1, 15), 16, 10) as bigint)"
            f" / 1152921504606846976.0 - 0.5)"
        )
        dot = (
            f"aggregate(zip_with({vec_col}, {h}, (x, y) -> cast(x as double) * y),"
            f" 0D, (a, v) -> a + v)"
        )
        bits.append(f"(case when {dot} >= 0D then '1' else '0' end)")
    return "concat(" + ", ".join(bits) + ")"


def cosine_near_dups(
    vectors: DataFrame, dim: int = 64, threshold: float = 0.99, n_planes: int = 16,
    bands: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: SRP-LSH blocking + exact cosine.

    Scale shape mirrors MinHash-LSH dedup: a narrow signature projection,
    a self-equi-join keyed on (band_id, band bits) — never all-pairs —
    then exact cosine verification on the candidate pair list only.
    Recall: a pair is missed only if every band has a plane separating it
    (P(miss) ~ (1 - (1 - theta/pi)^(n_planes/bands))^bands)."""
    bits_per_band = n_planes // bands
    sig = vectors.select(
        id_col, vec_col, F.expr(hyperplane_sig_expr(vec_col, dim, n_planes)).alias("_sig")
    )
    banded = sig.select(
        id_col,
        vec_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> struct(b as band_id,"
                f" substr(_sig, b * {bits_per_band} + 1, {bits_per_band}) as band_bits))"
            )
        ).alias("band"),
    ).select(id_col, vec_col, "band.band_id", "band.band_bits")
    a = banded.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("emb_a"), "band_id", "band_bits")
    b = banded.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("emb_b"), "band_id", "band_bits")
    cos = F.expr(COS_EXPR.format(a="emb_a", b="emb_b"))
    return (
        a.join(b, ["band_id", "band_bits"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
        .withColumn("cos_sim", F.round(cos, 6))
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5, n_centroids: int = 16, nprobe: int = 4,
    id_col: str = "vec_id", q_id_col: str = "q_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest cells per query."""
    cents = centroids = deterministic_centroids(vectors, n_centroids, id_col, vec_col)
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    qcos = F.expr(COS_EXPR.format(a="c_emb", b="q_emb"))
    qcells = (
        queries.select(F.col(q_id_col), F.col(vec_col).alias("q_emb"))
        .join(F.broadcast(cents))
        .select(q_id_col, "q_emb", "centroid_id", qcos.alias("_sim"))
    )
    wq = Window.partitionBy(q_id_col).orderBy(F.desc("_sim"), F.asc("centroid_id"))
    probes = qcells.withColumn("_rn", F.row_number().over(wq)).where(F.col("_rn") <= nprobe).select(
        q_id_col, "q_emb", "centroid_id"
    )
    cos = F.expr(COS_EXPR.format(a="q_emb", b=vec_col))
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        q_id_col, F.col(id_col), F.round(cos, 6).alias("cos_sim")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def semdedup(
    vectors: DataFrame,
    n_clusters: int = 16,
    iters: int = 2,
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup — semantic deduplication via embedding clustering
    (Abbas et al. 2023, arXiv:2303.09540; no counterpart in the
    reference — LLM-data-pipeline scope).

    k-means the corpus into `n_clusters` cells (kmeans_refine: the
    deterministic hash-seeded Lloyd trainer the IVF index already
    uses), then WITHIN each cell build the eps-similarity graph
    (round(cos, 6) >= eps), take connected components, and per
    duplicate group KEEP exactly one example — the paper's rule: the
    member with the LOWEST cosine similarity to its cluster centroid
    (the least prototypical, preserving diversity), ties to the
    smallest id. Singletons keep themselves.

    Returns (id_col, centroid_id, centroid_sim, component, keep):
    `component` is the smallest member id of the duplicate group,
    `keep` the paper's retention verdict; `semdedup(...).where("keep")`
    is the deduplicated corpus.

    Scale shape: NEVER all-pairs — the only self-join is keyed on
    centroid_id, so the pair space is sum(c_i^2) over cell sizes, and
    `n_clusters` is the knob that bounds it (the paper runs k = 50k on
    LAION-440M; k should grow with the corpus so cells stay ~1e4). The
    corpus is scanned once per Lloyd iteration + once for assignment;
    components run on the eps-graph only (vastly smaller than the
    corpus). Assignment+centroid_sim is localCheckpointed because three
    consumers reference it (both join sides + the final labeling) and
    Spark re-runs shared subtrees per reference (CLAUDE.md). At 100 TB
    the within-cell pairwise can be composed with SRP banding
    (cosine_near_dups) as a second blocking level; eps-graph edges are
    what shuffle, not the corpus."""
    from .canonicalize import connected_components

    cents = kmeans_refine(vectors, n_clusters, iters, id_col, vec_col)
    assigned = ivf_assign(vectors, cents, id_col, vec_col)
    csim = F.expr(COS_EXPR.format(a="c_emb", b=vec_col))
    withsim = (
        assigned.join(F.broadcast(cents), "centroid_id")
        .select(
            id_col, vec_col, "centroid_id", F.round(csim, 6).alias("centroid_sim")
        )
        .localCheckpoint(eager=False)
    )
    a = withsim.select(
        F.col(id_col).alias("_ida"), F.col(vec_col).alias("_emba"), "centroid_id"
    )
    b = withsim.select(
        F.col(id_col).alias("_idb"), F.col(vec_col).alias("_embb"), "centroid_id"
    )
    pcos = F.expr(COS_EXPR.format(a="_emba", b="_embb"))
    pairs = (
        a.join(b, "centroid_id")
        .where(F.col("_ida") < F.col("_idb"))
        .where(F.round(pcos, 6) >= eps)
    )
    from .dedup import pad_bigint19

    comp = connected_components(
        pairs.select(
            pad_bigint19("_ida", "semdedup").alias("src"),
            pad_bigint19("_idb", "semdedup").alias("dst"),
        )
    )
    labeled = (
        withsim.join(
            comp.select(
                F.col("node").cast("bigint").alias(id_col),
                F.col("component").cast("bigint").alias("component"),
            ),
            id_col,
            "left",
        )
        .withColumn("component", F.coalesce("component", F.col(id_col)))
    )
    keeper = labeled.groupBy("component").agg(
        F.min_by(F.col(id_col), F.struct("centroid_sim", id_col)).alias("_keep_id")
    )
    return labeled.join(keeper, "component").select(
        id_col,
        "centroid_id",
        "centroid_sim",
        "component",
        (F.col(id_col) == F.col("_keep_id")).alias("keep"),
    )


def ann_recall_at_k(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the IVF index against the exact cosine top-k — the
    standard ANN quality meter (Jégou et al. 2011 report IVF settings
    as recall@k curves): per query, the fraction of the true top-k the
    probed search returned.

    Returns (q_id_col, n_hits, recall) for every query, recall = hits/k
    in [0, 1]; a query whose probed cells miss the true neighbors scores
    0, never NULL.

    100 TB shape: both sides reuse the query frame broadcast; the exact
    side is the one-pass brute-force scan (run it on a SAMPLE of queries
    in production — recall estimation doesn't need every query), the IVF
    side touches only nprobe/n_centroids of the corpus; the intersection
    is a (q_id, vec_id)-keyed join of two k-row-per-query frames.

    Determinism: both rankings round cosine at 6dp and tie-break on
    vec_id (the established device), so membership — and therefore the
    recall numerator — is reproducible at any parallelism.
    """
    exact = cosine_topk(vectors, queries, k, id_col, q_id_col, vec_col).select(
        q_id_col, id_col
    )
    approx = ivf_topk(
        vectors, queries, k, n_centroids, nprobe, id_col, q_id_col, vec_col
    ).select(q_id_col, id_col)
    hits = (
        exact.join(approx, [q_id_col, id_col])
        .groupBy(q_id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        queries.select(q_id_col)
        .join(hits, q_id_col, "left")
        .select(
            q_id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / F.lit(float(k))).alias("recall"),
        )
    )


def hard_negative_topk(
    vectors: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive embedding training (the
    standard miner of the dense-retrieval / SimCLR literature, e.g.
    Robinson et al. 2021 "Contrastive Learning with Hard Negative
    Samples"): for each anchor, the k most-similar vectors with a
    DIFFERENT label — the negatives that most confuse the current
    embedding space, which is exactly what the next training round
    should see.

    anchors: (q_id_col, vec_col, label_col). Returns
    (q_id, vec_id, cos_sim, rank), rank 1 = hardest negative.

    100 TB shape: identical to cosine_topk (anchor set broadcast, one
    corpus scan, per-anchor window over k-bounded candidates) — mine
    from an IVF-probed candidate set instead of the full scan when the
    corpus is the whole training set. Same 6dp-round + id tie-break
    determinism device.
    """
    a = anchors.select(
        F.col(q_id_col),
        F.col(vec_col).alias("_q_emb"),
        F.col(label_col).alias("_q_label"),
    )
    cos = F.expr(COS_EXPR.format(a="_q_emb", b=vec_col))
    scored = (
        vectors.join(F.broadcast(a))
        .where(F.col(label_col) != F.col("_q_label"))
        .select(F.col(q_id_col), F.col(id_col), F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def pca_top_component(
    vectors: DataFrame,
    n_iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of an embedding column by power iteration
    (the textbook method; see Halko et al. 2011 §4 for the family) —
    the first step of PCA whitening / dimensionality reduction in
    embedding-pipeline prep.

    The operator is defined on milli-quantized, integer-mean-centered
    data, which makes EVERY intermediate an exact integer:

      xm      = floor(x * 1e3 + 0.5)                    (BIGINT)
      mu_i    = truncdiv(sum(xm_i), n)                  (BIGINT)
      A_ij    = sum over rows of (xm_i - mu_i)(xm_j - mu_j)
      v_0     = uniform; v_{t+1} = truncdiv(A v_t, truncdiv(L1(A v_t), 1e6))

    so the result is bit-identical at any parallelism / partitioning
    (no float sum anywhere), at the price of PCA-on-3dp-quantized data
    — indistinguishable from float PCA for direction estimation.
    truncdiv is sign-decomposed (sign(x) * (abs(x) div d)) because
    Spark's `div` truncates toward zero while DuckDB's `//` floors.

    Returns (dim_idx, loading): the L1-normalized dominant eigenvector
    (sum |loading| ~= 1), loading = v / 1e6 exact.

    100 TB shape: the only corpus-sized work is the (i, j) outer-product
    aggregation — a self-join co-keyed on id_col over the exploded
    frame, reduced map-side onto d^2 keys (4096 for d=64; partial
    aggregation collapses every partition to d^2 rows before the
    shuffle). |A_ij| <= n * (3e3)^2 stays inside BIGINT past 1e11 rows,
    and the matvec sum (bounded by d * max|A| * 1e6) is kept under 2^62
    at ANY n by a deterministic integer pre-scaling of A (shift == 1
    below ~7e10, i.e. at every test SF — see the inline guard).
    The n_iters matvec loop runs on the d^2-row A (localCheckpointed —
    Spark re-runs shared subtrees per reference, CLAUDE.md) and the
    d-row v: dimension-sized, free.
    """
    ex = (
        vectors.select(
            F.col(id_col),
            F.posexplode(F.col(vec_col)).alias("i", "_x"),
        )
        .select(
            id_col,
            "i",
            F.floor(F.col("_x").cast("double") * 1e3 + F.lit(0.5))
            .cast("bigint")
            .alias("_xm"),
        )
        .localCheckpoint(eager=False)
    )
    n = vectors.agg(F.count(F.lit(1)).alias("_n"))
    mu = (
        ex.groupBy("i")
        .agg(F.sum("_xm").alias("_s"))
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            (
                F.signum("_s").cast("bigint")
                * F.expr("abs(_s) div _n")
            ).alias("_mu"),
        )
    )
    c = ex.join(F.broadcast(mu), "i").select(
        id_col, "i", (F.col("_xm") - F.col("_mu")).alias("_c")
    )
    a = (
        c.alias("x")
        .join(c.alias("y"), id_col)
        .groupBy(F.col("x.i").alias("i"), F.col("y.i").alias("j"))
        .agg(F.sum(F.col("x._c") * F.col("y._c")).alias("_a"))
        .localCheckpoint(eager=False)
    )
    d_dim = mu.agg(F.count(F.lit(1)).alias("_d"))
    # matvec overflow guard: |w_i| <= d * max|A| * 1e6 must stay under
    # 2^63 (ANSI sum THROWS past it). Pre-scale A by the smallest integer
    # shift that bounds it: K = 2^62 div (1e6 * d), shift = max|A| div K
    # + 1 — then (max|A| div shift) < K so the sum is safe at ANY corpus
    # size. shift == 1 whenever max|A| < K (~7e10 at d=64), i.e. at every
    # test SF, so small-scale trajectories — and the oracles — are
    # untouched; the division is the same sign-decomposed truncdiv on
    # both engines. Direction is scale-invariant, so the eigenvector is
    # unchanged up to the quantization the contract already states.
    shift = (
        a.agg(F.max(F.abs(F.col("_a"))).alias("_amax"))
        .crossJoin(F.broadcast(d_dim))
        .select(
            (
                F.expr("_amax div (4611686018427387904L div (1000000L * _d))")
                + F.lit(1)
            ).alias("_shift")
        )
    )
    a = (
        a.crossJoin(F.broadcast(shift))
        .select(
            "i",
            "j",
            (
                F.signum("_a").cast("bigint") * F.expr("abs(_a) div _shift")
            ).alias("_a"),
        )
        .localCheckpoint(eager=False)
    )
    v = mu.crossJoin(F.broadcast(d_dim)).select(
        F.col("i").alias("j"), F.expr("1000000L div _d").alias("_v")
    )
    for _ in range(n_iters):
        w = (
            a.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("_a") * F.col("_v")).alias("_w"))
        )
        norm = w.agg(
            F.greatest(F.expr("sum(abs(_w)) div 1000000L"), F.lit(1).cast("bigint")).alias(
                "_l1m"
            )
        )
        # w is referenced twice (norm agg + the join below): checkpoint
        # per round or the matvec subtree doubles per iteration
        v = w.crossJoin(F.broadcast(norm)).select(
            F.col("i").alias("j"),
            (
                F.signum("_w").cast("bigint") * F.expr("abs(_w) div _l1m")
            ).alias("_v"),
        ).localCheckpoint(eager=False)
    return v.select(
        F.col("j").alias("dim_idx"), (F.col("_v") / F.lit(1e6)).alias("loading")
    )


def quantize_embeddings_int8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector affine uint8 quantization — the standard storage /
    memory-bandwidth reduction for vector indexes (the scalar-quantizer
    of Faiss/vector-DB practice; 4x smaller than float32):

        scale = (max - min) / 255;  q_i = round((x_i - min) / scale)

    Returns (id_col, zero_point, scale, qvec, max_abs_err): qvec is
    array<int> in [0, 255], dequantization is q * scale + zero_point,
    and max_abs_err is the per-vector reconstruction bound (<= scale/2
    by construction; reported so downstream recall analysis can gate on
    it). Flat vectors (max == min) quantize to all-zeros with scale 0.

    100 TB shape: a pure per-row projection — no shuffle, no UDF; the
    element lambdas are Spark HOFs (interpreted, not codegen'd — fine
    at 64 elements/row; swap to a vectorized Pandas UDF if profiling
    ever shows the HOF tax at a larger dim). Every arithmetic step is
    the same IEEE double expression on both engines, so qvec and the
    error bound replay exactly in the oracle.
    """
    mn = F.array_min(F.col(vec_col)).cast("double")
    mx = F.array_max(F.col(vec_col)).cast("double")
    s = (mx - mn) / F.lit(255.0)
    base = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        mn.alias("zero_point"),
        s.alias("scale"),
    )
    # flat vectors: scale 0 -> NULL division PER ELEMENT -> coalesce to 0
    q = F.transform(
        F.col(vec_col),
        lambda x: F.least(
            F.greatest(
                F.coalesce(
                    F.floor(
                        (x.cast("double") - F.col("zero_point"))
                        / F.expr("nullif(scale, 0.0d)")
                        + F.lit(0.5)
                    ),
                    F.lit(0).cast("bigint"),
                ),
                F.lit(0).cast("bigint"),
            ),
            F.lit(255).cast("bigint"),
        ).cast("int"),
    )
    withq = base.withColumn("qvec", q)
    err = F.array_max(
        F.zip_with(
            F.col(vec_col),
            F.col("qvec"),
            lambda x, qi: F.abs(
                x.cast("double")
                - (qi * F.col("scale") + F.col("zero_point"))
            ),
        )
    )
    return withq.select(
        id_col,
        "zero_point",
        "scale",
        "qvec",
        (F.floor(err * 1e6 + F.lit(0.5)) / 1e6).alias("max_abs_err"),
    )
