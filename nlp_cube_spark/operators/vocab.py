"""Vocabulary / Encodings computation (reference cube/io_utils/encodings.py).

The reference builds string->int dictionaries over a training corpus:
- word2int: lower-cased forms, digits folded to 0 (encodings.py:74), kept
  when count >= word_cutoff=7 (encodings.py:26,116-119)
- char2int: lower-cased characters, count >= char_cutoff=5, digits 0-9
  force-added (encodings.py:120-130)
- upos2int/xpos2int/attrs2int/label2int: open sets (encodings.py:94-107)

Spark mapping (SURVEY.md §1.4): groupBy().count() + cutoff filter; ids are
assigned by (count desc, token asc) rank — deterministic under any
parallelism, unlike the reference's first-sight order (documented
divergence; ids only need to be stable, not byte-equal). The result is
dimension-sized and meant to be broadcast to kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_CUTOFF = 7  # reference encodings.py:26
CHAR_CUTOFF = 5


def _rank_ids(df: DataFrame, key: str) -> DataFrame:
    """Global dense ids by (count desc, key asc) WITHOUT a single-task sort.

    A bare Window.orderBy funnels the whole vocab through one partition —
    fine at sf0.01, a straggler at a 100M-row vocab. The 0-based rank is
    the exclusive prefix COUNT in (-count, key) order, computed with the
    shared content-derived two-phase helper (operators/ranges.py) — ids are
    identical to the global window's because (count, key) is a total order
    (key is unique), and the bucket assignment is a pure function of row
    content (no repartitionByRange/spark_partition_id drift hazard)."""
    from .ranges import exclusive_prefix_sum

    ranked = exclusive_prefix_sum(
        df, [(-F.col("count")), F.col(key)], F.lit(1), out_col="_rk"
    )
    return ranked.withColumn("id", F.col("_rk").cast("int")).drop("_rk")


def word_vocab(words: DataFrame, form_col: str = "form", cutoff: int = WORD_CUTOFF) -> DataFrame:
    """(word, count, id) for digit-folded lower-cased forms above cutoff."""
    folded = F.regexp_replace(F.lower(F.col(form_col)), "[0-9]", "0").alias("word")
    counts = words.select(folded).groupBy("word").count().where(F.col("count") >= cutoff)
    return _rank_ids(counts, "word")


def char_vocab(words: DataFrame, form_col: str = "form", cutoff: int = CHAR_CUTOFF) -> DataFrame:
    """(ch, count, id); digits force-included even below cutoff."""
    chars = words.select(
        F.explode(F.split(F.lower(F.col(form_col)), "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy("ch").count()
    kept = counts.where((F.col("count") >= cutoff) | F.col("ch").rlike("^[0-9]$"))
    return _rank_ids(kept, "ch")


def label_vocab(words: DataFrame, col: str) -> DataFrame:
    """Open-set dictionary for upos/xpos/feats/deprel columns."""
    counts = words.groupBy(F.col(col).alias("label")).count()
    return _rank_ids(counts, "label")
