"""Canonicalization: lemma-normalized surface forms + connected components.

Co-referring node clustering over an equivalence-edge DataFrame
(north rule / SURVEY.md §2c): edges come from (a) apposition triples
("Alice, the scientist" => alice ~ scientist-alias-of-alice) and (b)
mentions linked to the same entity_id. Components are computed with a pure
DataFrame iterative min-label propagation — no GraphFrames dependency.

Scale notes: each round is one shuffle on node id; lineage is cut with
localCheckpoint() per round (SURVEY.md §4 item 3) so plans don't grow.
Alias/coref clusters are shallow (diameter <= ~6), so rounds ≈ diameter;
pointer doubling makes deep chains O(log diameter). Deterministic:
canonical id = min node id in the component.

Skew note (tested: test_connected_components_star_skew, 20k-leaf hub): a
mega-component does NOT concentrate on one reducer — the per-round groupBy
key is the NODE, so each leaf is its own group and the hub's deg(hub)-row
group is collapsed map-side by partial min() before the shuffle. The
residual cost of a mega-component is edge-table size, not key skew; the
iteration cap (max_iter) bounds pathological diameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def connected_components(edges: DataFrame, max_iter: int = 15) -> DataFrame:
    """edges (src STRING, dst STRING) -> (node STRING, component STRING).

    component = lexicographic min node reachable; undirected.

    ONE job per round: the convergence check rides the checkpoint job as
    an Observation instead of a second count() job (measured: the loop
    runs on a vocab-sized dimension, so per-round cost is dominated by
    job scheduling, not data — two tiny jobs per round doubled the
    canonicalize phase of kg_build_graph)."""
    sym = edges.select("src", "dst").union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.where(F.col("src").isNotNull() & F.col("dst").isNotNull()).dropDuplicates().localCheckpoint()
    nodes = sym.select(F.col("src").alias("node")).dropDuplicates()
    labels = nodes.withColumn("component", F.col("node"))

    def _step(lbl: DataFrame) -> DataFrame:
        # hop: min label over neighbors + self, then pointer-doubling:
        # component <- component(component) — turns O(diameter) min-
        # propagation into O(log diameter) steps (small-star/large-star)
        nbr = (
            sym.join(lbl, sym["src"] == lbl["node"])
            .select(F.col("dst").alias("node"), "component")
        )
        hop = (
            nbr.unionByName(lbl.select("node", "component"))
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        parent = hop.select(F.col("node").alias("_p"), F.col("component").alias("_pc"))
        return hop.join(parent, hop["component"] == parent["_p"], "left").select(
            "node", F.least(F.col("component"), F.coalesce("_pc", "component")).alias("component")
        )

    # TWO propagation steps per materialized round: the loop runs on a
    # vocab-sized dimension where per-round cost is job scheduling + the
    # checkpoint, not data (docstring above) — pairing steps halves the
    # job count while the label evolution stays the exact same function
    # sequence (a converged labeling is a fixed point of _step, so the
    # extra step of a pair never changes anything after convergence).
    for i in range(0, max_iter, 2):
        stepped = _step(labels)
        if i + 1 < max_iter:
            stepped = _step(stepped)
        old = labels.select("node", F.col("component").alias("_old"))
        merged = stepped.join(old, "node")  # node-keyed like everything else
        obs = Observation(f"cc_changed_{i}")
        new_labels = (
            merged.observe(
                obs,
                F.sum(
                    F.when(F.col("component") != F.col("_old"), 1).otherwise(0)
                ).alias("n"),
            )
            .select("node", "component")
            .localCheckpoint()  # eager: materializes AND fills the observation
        )
        try:
            changed = int(obs.get["n"] or 0)
        except Exception:
            # AQE empty-relation pruning drops CollectMetrics on an empty
            # plan (CLAUDE.md) — but NEVER assume convergence on an
            # arbitrary failure: an explicit comparison job is the
            # fallback (it reads the already-checkpointed tables, so this
            # path costs one small job only when the observation is lost)
            changed = (
                new_labels.join(old, "node")
                .where(F.col("component") != F.col("_old"))
                .limit(1)
                .count()
            )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_entities(linked_triples: DataFrame) -> DataFrame:
    """linked triples -> (mention, canonical_id STRING, canonical STRING).

    Equivalence edges:
      - appos pattern: subj ~ obj
      - same linked entity_id: mention ~ mention (via entity pivot node)
    Canonical surface = min mention in component (deterministic).
    """
    # distinct before the union: appos triples repeat the same surface
    # pair millions of times at scale (1.46M rows -> ~10^3 distinct at
    # sf1.0); partial (map-side) aggregation collapses them here, so the
    # cc sym-build dedups a dimension instead of re-scanning the corpus
    # volume twice (once per union direction)
    appos_edges = (
        linked_triples.where(F.col("pattern") == "appos")
        .select(F.lower("subj").alias("src"), F.lower("obj").alias("dst"))
        .dropDuplicates()
    )
    ent_edges = (
        linked_triples.select(F.lower("subj").alias("m"), F.col("subj_id").alias("eid"))
        .unionByName(linked_triples.select(F.lower("obj").alias("m"), F.col("obj_id").alias("eid")))
        .where(F.col("eid").isNotNull())
        .dropDuplicates()
        .select(F.col("m").alias("src"), F.concat(F.lit("eid:"), F.col("eid")).alias("dst"))
    )
    edges = appos_edges.unionByName(ent_edges)
    comps = connected_components(edges)
    mention_comps = comps.where(~F.col("node").startswith("eid:"))
    canon = mention_comps.groupBy("component").agg(F.min("node").alias("canonical"))
    return (
        mention_comps.join(canon, "component")
        .select(F.col("node").alias("mention"), F.col("component").alias("canonical_id"), "canonical")
    )


def canonicalize_triples(linked_triples: DataFrame) -> DataFrame:
    """Rewrite subj/obj to canonical surfaces; keep originals."""
    ents = canonical_entities(linked_triples)
    csub = F.broadcast(ents.select(F.col("mention").alias("_cs"), F.col("canonical").alias("subj_canon")))
    cobj = F.broadcast(ents.select(F.col("mention").alias("_co"), F.col("canonical").alias("obj_canon")))
    return (
        linked_triples.join(csub, F.lower(linked_triples["subj"]) == F.col("_cs"), "left")
        .join(cobj, F.lower(linked_triples["obj"]) == F.col("_co"), "left")
        .withColumn("subj_canon", F.coalesce("subj_canon", F.lower("subj")))
        .withColumn("obj_canon", F.coalesce("obj_canon", F.lower("obj")))
        .drop("_cs", "_co")
    )
