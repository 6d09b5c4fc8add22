"""Fuzzy matching + keyword scoring: model parity on tiny inputs,
blocking behavior, and the max_block cap engaging on a hot block."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.match import (
    blocked_levenshtein_pairs,
    keyword_tfidf_scores,
)


def test_pairs_match_python_model(spark):
    names = ["red widget", "red wadget", "red gadget", "blue widget", "red widgets"]
    df = spark.createDataFrame(
        [Row(pid=i, name=n, blk=n.split()[1][:3]) for i, n in enumerate(names)]
    )
    out = blocked_levenshtein_pairs(df, "pid", "name", ["blk"], max_distance=2)
    got = sorted((r.id_a, r.id_b, r.distance) for r in out.collect())

    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[-1]

    want = sorted(
        (i, j, lev(names[i], names[j]))
        for i, j in itertools.combinations(range(len(names)), 2)
        if names[i].split()[1][:3] == names[j].split()[1][:3]
        and lev(names[i], names[j]) <= 2
    )
    assert got == want
    # cross-block pair (red widget vs red gadget: blocks wid/gad) absent
    assert (0, 2, 2) not in got


def test_max_block_cap_bounds_hot_block(spark):
    rows = [Row(pid=i, name=f"name {i}", blk="hot") for i in range(2000)]
    df = spark.createDataFrame(rows)
    capped = blocked_levenshtein_pairs(
        df, "pid", "name", ["blk"], max_distance=10, max_block=100
    )
    uncapped_estimate = 2000 * 1999 / 2
    n = capped.count()
    # cap keeps the block's pair count orders below all-pairs
    assert 0 < n < uncapped_estimate / 10


def test_tfidf_scores_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark merge"),
            Row(doc_id=2, text="merge only here"),
            Row(doc_id=3, text="nothing relevant"),
            Row(doc_id=4, text="window merge spark"),
        ]
    )
    got = {
        r.doc_id: r.score
        for r in keyword_tfidf_scores(docs, ["spark", "merge", "window"]).collect()
    }
    n = 4
    df_ = {"spark": 2, "merge": 3, "window": 1}
    want = {
        1: 2 * n / df_["spark"] + 1 * n / df_["merge"],
        2: 1 * n / df_["merge"],
        4: 1 * n / df_["spark"] + 1 * n / df_["merge"] + 1 * n / df_["window"],
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
