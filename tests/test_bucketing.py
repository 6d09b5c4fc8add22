"""Bucketed tables: the shuffle-free co-located join contract, the
sorted-bucket sort elision, and bucket-pruned point lookups."""

import uuid

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.bucketing import (
    assert_no_shuffle,
    bucketed_join,
    write_bucketed,
)
from pg_auto_dw_spark.sources import load_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    """orders + lineitem bucketed on the join key into the same count."""
    suffix = uuid.uuid4().hex[:8]
    names = (f"orders_b_{suffix}", f"lineitem_b_{suffix}")
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        names[0], str(tmp_path / "o"), ["o_orderkey"], 8,
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        names[1], str(tmp_path / "l"), ["o_orderkey"], 8,
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_shuffle_and_matches(spark, sf_dir, bucketed_pair):
    orders_b, lineitem_b = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, orders_b, lineitem_b, on=["o_orderkey"])
        assert_no_shuffle(joined)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # parity with the plain parquet join
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        assert joined.count() == o.join(li, "o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_pair):
    _, lineitem_b = bucketed_pair
    out = (
        spark.table(lineitem_b)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert_no_shuffle(out)
    assert out.count() > 0


def test_assert_no_shuffle_raises_on_plain_join(spark, sf_dir):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        with pytest.raises(AssertionError):
            assert_no_shuffle(o.join(li, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
