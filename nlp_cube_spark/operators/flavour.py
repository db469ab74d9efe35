"""Flavour dispatch: language/flavour string -> lang_id (reference #21).

The reference maps a user-facing flavour (e.g. 'en_lines') to the model's
language-embedding index via a dict loaded from the tokenizer yaml
(cube/api.py:54-58, 108-116). Spark mapping (SURVEY.md §2a #21): a
broadcast lookup dimension joined onto pages; unknown flavours fall back
to the base language's default flavour, then to lang_id 0 — mirroring the
reference's `default_flavour` fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# base-language flavour table (stands in for the yaml's language_map)
FLAVOURS: dict[str, list[str]] = {
    "en": ["en_ewt", "en_lines", "en_gum"],
    "es": ["es_ancora", "es_gsd"],
    "fr": ["fr_gsd", "fr_sequoia"],
    "de": ["de_gsd"],
    "zh": ["zh_gsd"],
}


def flavour_dim(spark: SparkSession) -> DataFrame:
    """(flavour, lang, lang_id) lookup dimension; lang_id is the index in
    the per-language flavour list (reference language_codes order)."""
    rows = []
    next_id = 0
    for lang in sorted(FLAVOURS):
        for fl in FLAVOURS[lang]:
            rows.append((fl, lang, next_id))
            next_id += 1
    return spark.createDataFrame(rows, "flavour string, lang string, lang_id int")


def with_lang_id(pages: DataFrame, spark: SparkSession, flavour_col: str | None = None) -> DataFrame:
    """Attach lang_id via broadcast join; default flavour = first flavour
    of the page's lang; unknown lang -> lang_id 0."""
    dim = flavour_dim(spark)
    if flavour_col is None:
        # default flavour per language = the first listed
        default = dim.groupBy("lang").agg(F.min_by("lang_id", "lang_id").alias("lang_id"))
        return pages.join(F.broadcast(default), "lang", "left").withColumn(
            "lang_id", F.coalesce("lang_id", F.lit(0))
        )
    hit = dim.select(F.col("flavour").alias("_fl"), F.col("lang_id").alias("_flid"))
    deflt = dim.groupBy("lang").agg(F.min("lang_id").alias("_dlid"))
    return (
        pages.join(F.broadcast(hit), pages[flavour_col] == F.col("_fl"), "left")
        .join(F.broadcast(deflt), "lang", "left")
        .withColumn("lang_id", F.coalesce("_flid", "_dlid", F.lit(0)))
        .drop("_fl", "_flid", "_dlid")
    )
