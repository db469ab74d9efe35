"""Physical-plan regression tests: the properties in PLANS.md must hold."""

import pytest

import __spark_entry__ as E
from nlp_cube_spark.datagen import pages_df
from nlp_cube_spark.operators import annotate as A

SF = "/root/testdata/sf0.01"


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_and_pruning(spark):
    p = _plan(spark, E.queries()["pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # only the referenced columns reach the scan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = m.group(1).split(",")
    assert 5 <= len(cols) <= 8, cols


def test_dimension_joins_broadcast(spark):
    p = _plan(spark, E.queries()["region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in p


def test_lemma_join_is_broadcast(spark):
    p = _plan(spark, A.annotate(pages_df(spark, 5, seed=1)))
    assert "BroadcastHashJoin" in p


def test_fused_path_has_no_shuffle(spark):
    p = _plan(spark, A.fused_triples(pages_df(spark, 5, seed=1)))
    assert "Exchange" not in p


def test_topk_is_take_ordered(spark):
    p = _plan(spark, E.queries()["orders_topk"](spark, SF))
    assert "TakeOrderedAndProject" in p
