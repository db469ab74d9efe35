"""Entity linking: candidate generation + best-candidate selection.

Reference has no linking stage; semantics per SURVEY.md §2c / north rule:
- candidate generation = broadcast join of mention surface/lemma forms
  against the alias dictionary (dimension-sized -> F.broadcast, never a
  shuffle of the fact side);
- scoring = alias prior (deterministic v0 scorer; a learned scorer would
  slot into the same argmax);
- selection = argmax per mention. Two physical forms:
    * `link_mentions` (default): groupBy + max_by over a struct — one
      partial-aggregatable shuffle, no sort;
    * `link_mentions_window`: Window.partitionBy(mention).orderBy(...) +
      row_number()=1 — the §2d window-ranking form, same result.
  Ties broken by (higher prior, lower entity_id): fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """Distinct mention surface forms from subj+obj positions."""
    subs = triples.select(F.lower("subj").alias("mention"))
    objs = triples.select(F.lower("obj").alias("mention"))
    return subs.unionByName(objs).dropDuplicates()


def candidates(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """mention x alias-dictionary candidates (broadcast hash join)."""
    return mentions.join(
        F.broadcast(aliases), mentions["mention"] == aliases["alias"], "inner"
    ).select("mention", "entity_id", "prior")


def link_mentions(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Best candidate per mention via max_by (partial-agg friendly)."""
    cand = candidates(mentions, aliases)
    rank_key = F.struct(F.col("prior"), (-F.col("entity_id")).alias("neg_id"))
    return cand.groupBy("mention").agg(
        F.max_by(F.col("entity_id"), rank_key).alias("entity_id"),
        F.max("prior").alias("score"),
    )


def link_mentions_window(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Same selection expressed as window ranking (SURVEY.md §2d)."""
    cand = candidates(mentions, aliases)
    w = Window.partitionBy("mention").orderBy(F.desc("prior"), F.asc("entity_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("mention", "entity_id", F.col("prior").alias("score"))
    )


def link_triples(triples: DataFrame, aliases: DataFrame) -> DataFrame:
    """Attach subj_id/obj_id to triples; unlinked mentions get NULL ids.

    The linked-mentions table is mention-distinct (Zipf-bounded vocabulary),
    so both attach joins broadcast."""
    linked = link_mentions(mentions_from_triples(triples), aliases)
    lsub = F.broadcast(linked.select(F.col("mention").alias("_ms"), F.col("entity_id").alias("subj_id")))
    lobj = F.broadcast(linked.select(F.col("mention").alias("_mo"), F.col("entity_id").alias("obj_id")))
    return (
        triples.join(lsub, F.lower(triples["subj"]) == F.col("_ms"), "left")
        .join(lobj, F.lower(triples["obj"]) == F.col("_mo"), "left")
        .drop("_ms", "_mo")
    )
