"""Binned range join: semantics vs a brute-force model, boundary
inclusivity, left-outer rows, keyed variant, and the plan guarantee
(no nested-loop / cartesian operator ever appears)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.rangejoin import range_join, range_join_agg

T0 = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def _left(spark, secs):
    return spark.createDataFrame(
        [Row(lid=i, lts=_ts(s)) for i, s in enumerate(secs)]
    )


def _right(spark, secs):
    return spark.createDataFrame(
        [Row(rid=i, rts=_ts(s)) for i, s in enumerate(secs)]
    )


def _model(lsecs, rsecs, lo, hi):
    return sorted(
        (li, ri)
        for li, ls in enumerate(lsecs)
        for ri, rs in enumerate(rsecs)
        if ls + lo <= rs <= ls + hi
    )


def test_matches_bruteforce_model(spark):
    # Timestamps straddle bin edges on purpose: width=30, bins at 0/30/...
    lsecs = [0, 29.5, 30.0, 45.2, 100, 61]
    rsecs = [1, 15, 29.9, 30.1, 59.9, 60.0, 75, 130.0]
    lo, hi = -30, 0
    out = range_join(
        _left(spark, lsecs), _right(spark, rsecs), "lts", "rts", lo, hi
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    assert got == _model(lsecs, rsecs, lo, hi)


def test_boundaries_inclusive_and_forward_window(spark):
    # forward window [0, +10]: both endpoints match
    out = range_join(
        _left(spark, [100]), _right(spark, [100, 110, 110.000001, 99.999]),
        "lts", "rts", 0, 10,
    )
    assert sorted(r.rid for r in out.collect()) == [0, 1]


def test_left_outer_keeps_unmatched(spark):
    out = range_join(
        _left(spark, [0, 1000]), _right(spark, [995]),
        "lts", "rts", -10, 0, how="left",
    )
    rows = {r.lid: r.rid for r in out.collect()}
    assert rows == {0: None, 1: 0}


def test_equi_keys_conjunct(spark):
    l = spark.createDataFrame([Row(k="a", lid=0, lts=_ts(50)),
                               Row(k="b", lid=1, lts=_ts(50))])
    r = spark.createDataFrame([Row(k="a", rid=0, rts=_ts(45)),
                               Row(k="b", rid=1, rts=_ts(200))])
    out = range_join(l, r, "lts", "rts", -10, 0, on=["k"])
    assert [(x.k, x.lid, x.rid) for x in out.collect()] == [("a", 0, 0)]


def test_agg_counts_and_empty_groups(spark):
    l = _left(spark, [100, 5000])
    r = _right(spark, [95, 99, 100, 101])  # 101 outside [-10, 0]
    out = range_join_agg(
        l, r, "lts", "rts", -10, 0,
        aggs=[F.count("rid").alias("n"), F.sum("rid").alias("s")],
    )
    rows = {x.lid: (x.n, x.s) for x in out.collect()}
    assert rows == {0: (3, 0 + 1 + 2), 1: (0, None)}


def test_plan_has_no_nested_loop(spark, sf_dir):
    from pg_auto_dw_spark.queries_catalog import (
        events_range_click_attribution,
    )

    df = events_range_click_attribution(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert df.count() > 0
