from pyspark.sql import functions as F

from nlp_cube_spark.datagen import pages_df
from nlp_cube_spark.operators.flavour import FLAVOURS, flavour_dim, with_lang_id


def test_flavour_dim_ids_stable(spark):
    ids = {r.flavour: r.lang_id for r in flavour_dim(spark).collect()}
    assert len(set(ids.values())) == len(ids)  # unique
    assert ids["en_ewt"] < ids["en_lines"]  # listed order preserved


def test_default_flavour_dispatch(spark):
    pages = pages_df(spark, 20, seed=3)
    out = with_lang_id(pages, spark)
    rows = out.select("lang", "lang_id").dropDuplicates().collect()
    dim = {r.lang: r.lang_id for r in flavour_dim(spark).groupBy("lang").agg(F.min("lang_id").alias("lang_id")).collect()}
    for r in rows:
        assert r.lang_id == dim.get(r.lang, 0)


def test_explicit_flavour_and_fallback(spark):
    pages = pages_df(spark, 6, seed=3).withColumn(
        "flavour", F.when(F.col("lang") == "en", "en_lines").otherwise(F.lit("nope"))
    )
    out = with_lang_id(pages, spark, flavour_col="flavour")
    dim = {r.flavour: r.lang_id for r in flavour_dim(spark).collect()}
    for r in out.select("lang", "flavour", "lang_id").collect():
        if r.flavour == "en_lines":
            assert r.lang_id == dim["en_lines"]
        else:  # unknown flavour -> base-language default
            assert r.lang_id == min(
                d for f, d in dim.items() if f in FLAVOURS.get(r.lang, [])
            ) if r.lang in FLAVOURS else 0
