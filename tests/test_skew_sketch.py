"""Skew-safe exact aggregation (parity with the plain plan, plan
shape) and sketch error bounds against exact answers."""

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.sketch import approx_distinct, approx_quantiles
from pg_auto_dw_spark.functions.skew import (
    distinct_count_skewsafe,
    heavy_hitters,
    salted_agg,
)


def _zipf(spark, n=5000, seed=7):
    rng = random.Random(seed)
    rows = [
        Row(
            k="hot" if rng.random() < 0.8 else f"k{rng.randrange(50)}",
            v=rng.uniform(-100, 100),
            u=rng.randrange(400),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows)


def test_salted_agg_matches_plain_groupby(spark):
    df = _zipf(spark)
    got = {
        r.k: r
        for r in salted_agg(
            df,
            ["k"],
            [("count", "v", "n"), ("sum", "v", "s"),
             ("min", "v", "mn"), ("max", "v", "mx")],
            n_salts=16,
            avg_of=[("s", "n", "avg")],
        ).collect()
    }
    want = {
        r.k: r
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            (F.sum("v") / F.count("v")).alias("avg"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k].n == want[k].n
        assert got[k].mn == want[k].mn and got[k].mx == want[k].mx
        assert abs(got[k].s - want[k].s) < 1e-9 * max(1, abs(want[k].s))
        assert abs(got[k].avg - want[k].avg) < 1e-9


def test_salted_agg_rejects_non_algebraic(spark):
    df = _zipf(spark, 50)
    import pytest

    with pytest.raises(ValueError):
        salted_agg(df, ["k"], [("median", "v", "m")])


def test_salted_agg_partitioning_invariant(spark):
    df = _zipf(spark, 1000)
    a = salted_agg(df, ["k"], [("count", "v", "n")], n_salts=8).collect()
    b = salted_agg(
        df.repartition(17), ["k"], [("count", "v", "n")], n_salts=8
    ).collect()
    assert sorted((r.k, r.n) for r in a) == sorted((r.k, r.n) for r in b)


def test_salted_plan_has_two_aggregate_phases(spark):
    df = _zipf(spark, 200)
    out = salted_agg(df, ["k"], [("sum", "v", "s")], n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two logical groupBys -> at least two exchanges (salted + final),
    # and nothing fell back to Python
    assert plan.count("Exchange") >= 2
    assert "Python" not in plan


def test_distinct_count_skewsafe_exact(spark):
    df = _zipf(spark)
    got = {r.k: r.n_distinct for r in distinct_count_skewsafe(df, ["k"], "u").collect()}
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n")).collect()
    }
    assert got == want


def test_heavy_hitters_threshold_and_bound(spark):
    df = _zipf(spark)
    hh = heavy_hitters(df, "k", min_share=0.05).collect()
    # 'hot' holds ~80% of rows; every k{i} holds ~0.4%
    assert [r.k for r in hh] == ["hot"]
    assert hh[0].share > 0.7
    total = df.count()
    assert hh[0].cnt >= 0.05 * total


def test_hll_within_error_bound(spark):
    df = _zipf(spark, 8000)
    got = {
        r.k: r.approx_n_distinct
        for r in approx_distinct(df, ["k"], "u", rsd=0.02).collect()
    }
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n")).collect()
    }
    for k, exact in want.items():
        assert abs(got[k] - exact) <= max(2, 0.1 * exact), (k, got[k], exact)


def test_quantile_sketch_rank_error(spark):
    df = _zipf(spark, 8000).filter(F.col("k") == "hot")
    probs = [0.1, 0.5, 0.9]
    got = approx_quantiles(df, ["k"], "v", probs, accuracy=10000).collect()[0]
    vals = sorted(r.v for r in df.select("v").collect())
    n = len(vals)
    for p, q in zip(probs, got.quantiles):
        # rank of the sketch answer must be within 1% of the target
        import bisect

        rank = bisect.bisect_left(vals, q)
        assert abs(rank - p * n) <= 0.01 * n + 2, (p, q, rank)


def test_salted_join_matches_plain_join(spark):
    df = _zipf(spark)
    dim = spark.createDataFrame(
        [Row(k=f"k{i}", grp=i % 3) for i in range(50)] + [Row(k="hot", grp=9)]
    )
    from pg_auto_dw_spark.functions.skew import salted_join

    for how in ("inner", "left"):
        got = (
            salted_join(df, dim, on=["k"], n_salts=8, how=how)
            .groupBy("k", "grp")
            .count()
            .collect()
        )
        want = (
            df.join(dim, on=["k"], how=how).groupBy("k", "grp").count().collect()
        )
        assert sorted((r.k, r.grp, r["count"]) for r in got) == sorted(
            (r.k, r.grp, r["count"]) for r in want
        ), how


def test_salted_join_left_keeps_unmatched_once(spark):
    fact = spark.createDataFrame([Row(k="nope", v=1.0), Row(k="hot", v=2.0)])
    dim = spark.createDataFrame([Row(k="hot", grp=1)])
    from pg_auto_dw_spark.functions.skew import salted_join

    rows = salted_join(fact, dim, on=["k"], n_salts=8, how="left").collect()
    assert sorted((r.k, r.grp) for r in rows) == [("hot", 1), ("nope", None)]
