"""KG-embedding training-data preparation: deterministic negative
sampling over the triple store.

The corruption protocol is TransE's (Bordes et al. 2013, "Translating
Embeddings for Modeling Multi-relational Data", NeurIPS — public
knowledge; no counterpart in the reference): for every true triple
(s, p, o) draw k negatives by replacing EITHER the subject or the
object with an entity sampled uniformly from the entity vocabulary,
and (the 'filtered' setting, Bordes §4) discard corruptions that
happen to be true triples.

Randomness is hash-derived (the repo's no-RNG discipline): the side
choice and the replacement entity index are md5 functions of
(s, p, o, sample_id), so the sample set is a pure function of the
triple store — reproducible on any engine / partitioning, and fully
DuckDB-oracle-replayable.

Scale shape: the entity vocabulary gets a dense rank once (a
dimension-sized window — at web scale swap in the range-partitioned
rank of vocab._rank_ids, same contract) and is joined back by rank
(broadcast at dimension size); the k-fold expansion is a posexplode of
sequence(1, k) — map-side; the filtered-setting check is one anti-join
on the triple key.  Nothing shuffles wider than k x |triples|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 60-bit md5 prefix as BIGINT — the oracle-portable hash used across the
# dedup/sampling family (dedup.H60's expression shape)
_H60 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"


def corrupt_triples(
    triples: DataFrame,
    k: int = 2,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """k hash-derived negatives per true triple, filtered setting.

    Returns (subj, pred, obj, sample_id, corrupted, neg_subj, neg_obj):
    the original triple, which side was corrupted ('subj'|'obj'), and
    the corrupted pair.  Negatives whose replacement equals the original
    entity, or which reconstruct a TRUE triple (filtered setting), are
    dropped — so a triple can yield fewer than k rows; the drop is the
    protocol, not a cap."""
    trips = (
        triples.select(subj_col, pred_col, obj_col)
        .where(
            F.col(subj_col).isNotNull()
            & F.col(pred_col).isNotNull()
            & F.col(obj_col).isNotNull()
        )
        .dropDuplicates()
        .localCheckpoint(eager=False)  # feeds entities, expansion, anti-join
    )
    ents = (
        trips.select(F.col(subj_col).alias("entity"))
        .unionByName(trips.select(F.col(obj_col).alias("entity")))
        .dropDuplicates()
    )
    # dense 0-based rank over the entity dimension; vocab._rank_ids is
    # the range-partitioned form of this when the dimension outgrows one
    # window partition
    ents = ents.select(
        "entity",
        (F.row_number().over(Window.orderBy("entity")) - 1).alias("_rank"),
    )
    n_ents = ents.groupBy().agg(F.count(F.lit(1)).alias("_n"))

    h = _H60.format(
        x=f"concat({subj_col}, chr(1), {pred_col}, chr(1), {obj_col}, chr(1), sample_id)"
    )
    exp = (
        trips.select(
            subj_col,
            pred_col,
            obj_col,
            F.explode(F.expr(f"sequence(1, {int(k)})")).alias("sample_id"),
        )
        .crossJoin(F.broadcast(n_ents))
        .select(
            subj_col,
            pred_col,
            obj_col,
            "sample_id",
            F.expr(f"{h} % 2 = 0").alias("_corrupt_subj"),
            F.expr(f"({h} div 2) % _n").alias("_rank"),
        )
    )
    repl = exp.join(F.broadcast(ents), "_rank").select(
        subj_col,
        pred_col,
        obj_col,
        "sample_id",
        F.when(F.col("_corrupt_subj"), F.lit("subj")).otherwise(F.lit("obj")).alias(
            "corrupted"
        ),
        F.when(F.col("_corrupt_subj"), F.col("entity"))
        .otherwise(F.col(subj_col))
        .alias("neg_subj"),
        F.when(F.col("_corrupt_subj"), F.col(obj_col))
        .otherwise(F.col("entity"))
        .alias("neg_obj"),
    )
    # no-op corruptions out, then the filtered setting: a negative that
    # IS a true triple teaches nothing
    repl = repl.where(
        (F.col("neg_subj") != F.col(subj_col)) | (F.col("neg_obj") != F.col(obj_col))
    )
    truth = trips.select(
        F.col(subj_col).alias("neg_subj"),
        F.col(pred_col).alias(pred_col),
        F.col(obj_col).alias("neg_obj"),
    )
    return repl.join(truth, ["neg_subj", pred_col, "neg_obj"], "left_anti").select(
        subj_col, pred_col, obj_col, "sample_id", "corrupted", "neg_subj", "neg_obj"
    )
