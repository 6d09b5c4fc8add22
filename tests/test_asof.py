"""As-of join / PIT table semantics (functions/asof.py) and the plan
contract: the union+carry-forward implementation must contain NO join
operator and exactly one exchange on the key."""

import datetime

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.asof import asof_join, pit_snapshot


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_join_semantics(spark):
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), "v1"),
            (1, _ts("2024-01-01 12:00:00"), "v2"),
            (2, _ts("2024-01-01 11:00:00"), "w1"),
        ],
        ["k", "rts", "val"],
    )
    left = _mk(
        spark,
        [
            (1, 100, _ts("2024-01-01 09:00:00")),  # before any -> NULL
            (1, 101, _ts("2024-01-01 10:00:00")),  # equal instant -> v1 (inclusive)
            (1, 102, _ts("2024-01-01 11:59:59")),  # between -> v1
            (1, 103, _ts("2024-01-01 23:00:00")),  # after all -> v2
            (2, 200, _ts("2024-01-01 11:30:00")),  # other key -> w1
            (3, 300, _ts("2024-01-01 11:30:00")),  # key with no versions
        ],
        ["k", "probe_id", "lts"],
    )
    out = {
        r["probe_id"]: (r["val"], r["rts"])
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", suffix=""
        ).collect()
    }
    assert out[100] == (None, None)
    assert out[101] == ("v1", _ts("2024-01-01 10:00:00"))
    assert out[102] == ("v1", _ts("2024-01-01 10:00:00"))
    assert out[103] == ("v2", _ts("2024-01-01 12:00:00"))
    assert out[200] == ("w1", _ts("2024-01-01 11:00:00"))
    assert out[300] == (None, None)


def test_asof_join_plan_has_no_join_one_exchange(spark):
    """The scale contract: no join operator of any kind (a range join
    would be a BroadcastNestedLoopJoin), exactly one exchange."""
    right = _mk(spark, [(1, _ts("2024-01-01 10:00:00"), "v")], ["k", "rts", "val"])
    left = _mk(spark, [(1, 9, _ts("2024-01-02 00:00:00"))], ["k", "pid", "lts"])
    plan = (
        asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_pit_snapshot_grain_and_nulls(spark):
    versions = _mk(
        spark,
        [
            (1, _ts("2024-01-05 00:00:00"), 10.0),
            (1, _ts("2024-01-20 00:00:00"), 11.0),
            (2, _ts("2024-01-25 00:00:00"), 20.0),
        ],
        ["k", "load_ts", "bal"],
    )
    snaps = [_ts("2024-01-01 00:00:00"), _ts("2024-01-15 00:00:00"), _ts("2024-02-01 00:00:00")]
    pit = pit_snapshot(versions, snaps, on=["k"], ts_col="load_ts", payload=["bal"])
    rows = {(r["k"], r["snapshot_ts"]): (r["load_ts"], r["bal"]) for r in pit.collect()}
    assert len(rows) == 2 * 3  # |keys| x |snapshots|
    assert rows[(1, snaps[0])] == (None, None)  # before first load
    assert rows[(1, snaps[1])] == (_ts("2024-01-05 00:00:00"), 10.0)
    assert rows[(1, snaps[2])] == (_ts("2024-01-20 00:00:00"), 11.0)
    assert rows[(2, snaps[1])] == (None, None)
    assert rows[(2, snaps[2])] == (_ts("2024-01-25 00:00:00"), 20.0)


def test_asof_matches_bruteforce_on_events(spark, sf_dir):
    """Cross-check the carry-forward plan against a brute-force
    window-over-range implementation on real event data."""
    from pg_auto_dw_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").limit(2000).localCheckpoint(eager=True)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("cts")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    got = {
        r["event_id"]: r["pid"]
        for r in asof_join(
            clicks, purch, on=["user_id"], left_ts="cts", right_ts="pts", suffix=""
        ).collect()
    }
    brute = (
        clicks.join(purch, "user_id", "left")
        .filter((F.col("pts") <= F.col("cts")) | F.col("pts").isNull())
        .groupBy("event_id")
        .agg(F.max(F.struct("pts", "pid")).alias("m"))
        .select("event_id", F.col("m.pid").alias("pid"))
    )
    exp = {r["event_id"]: r["pid"] for r in brute.collect()}
    # brute loses clicks whose user has purchases but none prior;
    # compare on the matched set + assert unmatched are NULL in ours
    for eid, pid in exp.items():
        assert got[eid] == pid
    for eid in set(got) - set(exp):
        assert got[eid] is None
