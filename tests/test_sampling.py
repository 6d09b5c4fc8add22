"""Deterministic stratified sampling: reproducibility across
partitionings, per-stratum rate behavior, exact-n selection, and the
zero-shuffle plan claim for the rate-based form."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.sampling import (
    MODULUS,
    stratified_fixed_n,
    stratified_sample,
)


def _corpus(spark, n=2000):
    rows = [
        Row(doc_id=i, lang=["en", "de", "zh"][i % 3])
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_selection_is_partitioning_invariant(spark):
    df = _corpus(spark)
    a = stratified_sample(df, "doc_id", {"en": 0.3}, "lang", 0.6)
    b = stratified_sample(
        df.repartition(13, "lang"), "doc_id", {"en": 0.3}, "lang", 0.6
    )
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_rates_apply_per_stratum(spark):
    df = _corpus(spark, 3000)
    out = stratified_sample(
        df, "doc_id", {"en": 0.2, "zh": 0.9}, "lang", 0.5
    ).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in out}
    # each stratum has 1000 rows; multiplicative-hash ranks are
    # near-uniform, allow +-8% absolute
    assert abs(got["en"] - 200) < 80
    assert abs(got["zh"] - 900) < 80
    assert abs(got["de"] - 500) < 80


def test_zero_rate_and_full_rate(spark):
    df = _corpus(spark, 300)
    none = stratified_sample(df, "doc_id", {}, "lang", 0.0)
    assert none.count() == 0
    # rank < MODULUS always holds at rate 1.0
    every = stratified_sample(
        df, "doc_id", {"en": 1.0, "de": 1.0, "zh": 1.0}, "lang"
    )
    assert every.count() == 300


def test_fixed_n_exact_counts_and_determinism(spark):
    df = _corpus(spark, 1500)  # 500 per lang
    out = stratified_fixed_n(df, "doc_id", 40, "lang")
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 40, "de": 40, "zh": 40}
    again = stratified_fixed_n(df.repartition(7), "doc_id", 40, "lang")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # small stratum: returns the whole stratum
    tiny = spark.createDataFrame([Row(doc_id=i, lang="fr") for i in range(5)])
    assert stratified_fixed_n(tiny, "doc_id", 40, "lang").count() == 5


def test_rate_sample_plan_has_no_exchange(spark, sf_dir):
    from pg_auto_dw_spark.queries_catalog import documents_stratified_sample

    df = documents_stratified_sample(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert df.count() > 0


def test_rank_matches_plain_python(spark):
    df = _corpus(spark, 50)
    from pg_auto_dw_spark.functions.sampling import sample_rank

    got = {
        r.doc_id: r.rk
        for r in df.select("doc_id", sample_rank(F.col("doc_id")).alias("rk")).collect()
    }
    for i in range(50):
        assert got[i] == (i * 2654435761) % MODULUS


def test_temperature_mixture_plan_and_sample(spark, sf_dir):
    """alpha=1 reproduces natural proportions; alpha=0 weights strata
    uniformly; rates cap at 1.0; the sample is deterministic across
    partitionings and respects the per-stratum rate thresholds."""
    from pg_auto_dw_spark.functions.sampling import (
        temperature_mixture_plan,
        temperature_sample,
    )
    from pg_auto_dw_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    plan1 = temperature_mixture_plan(docs, "source", alpha=1.0)
    for row in plan1:
        assert abs(row["weight"] - row["n_rows"] / n) < 1e-12
    plan0 = temperature_mixture_plan(docs, "source", alpha=0.0)
    u = 1.0 / len(plan0)
    assert all(abs(r["weight"] - u) < 1e-12 for r in plan0)
    # alpha between: tail strata gain weight vs natural
    planh = {r["stratum"]: r for r in temperature_mixture_plan(docs, "source", 0.5)}
    nat = {r["stratum"]: r for r in plan1}
    smallest = min(nat, key=lambda s: nat[s]["n_rows"])
    largest = max(nat, key=lambda s: nat[s]["n_rows"])
    if nat[smallest]["n_rows"] < nat[largest]["n_rows"]:
        assert planh[smallest]["weight"] > nat[smallest]["weight"]
        assert planh[largest]["weight"] < nat[largest]["weight"]
    # budgeted plan: rates in [0, 1], targets sum ~ budget (cap-truncated)
    budget = n // 3
    planb = temperature_mixture_plan(docs, "source", 0.5, budget_rows=budget)
    assert all(0.0 <= r["rate"] <= 1.0 for r in planb)
    assert sum(r["target_n"] for r in planb) <= budget
    s = temperature_sample(docs, "doc_id", "source", 0.5, budget)
    got = s.count()
    assert 0 < got < n
    # deterministic across partitionings
    s2 = temperature_sample(docs.repartition(7), "doc_id", "source", 0.5, budget)
    assert {r["doc_id"] for r in s.collect()} == {r["doc_id"] for r in s2.collect()}


def test_repeat_sample_deterministic_upweighting(spark, sf_dir):
    """Integer factors repeat exactly; fractional factors add the extra
    copy for exactly the rank-threshold subset (deterministic, not
    probabilistic); factor 0 drops; copy_id keeps keys unique."""
    from pg_auto_dw_spark.functions.sampling import (
        MODULUS,
        repeat_sample,
        sample_rank,
    )
    from pg_auto_dw_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    a, b = sorted(langs)[0], sorted(langs)[1]
    n_a = docs.filter(F.col("lang") == a).count()
    n_b = docs.filter(F.col("lang") == b).count()
    out = repeat_sample(docs, "doc_id", {a: 2.0, b: 2.5}, "lang", default_factor=0.0)
    assert out.filter(F.col("lang") == a).count() == 2 * n_a
    # the fractional extra is exactly the rank < 0.5*MODULUS subset
    extra = docs.filter(
        (F.col("lang") == b) & (sample_rank(F.col("doc_id")) < int(0.5 * MODULUS))
    ).count()
    assert out.filter(F.col("lang") == b).count() == 2 * n_b + extra
    assert out.filter(~F.col("lang").isin([a, b])).count() == 0  # default 0 drops
    # (key, copy_id) unique; deterministic across partitionings
    assert out.select("doc_id", "copy_id").distinct().count() == out.count()
    again = repeat_sample(
        docs.repartition(9), "doc_id", {a: 2.0, b: 2.5}, "lang", default_factor=0.0
    )
    assert sorted(
        (r["doc_id"], r["copy_id"]) for r in again.select("doc_id", "copy_id").collect()
    ) == sorted(
        (r["doc_id"], r["copy_id"]) for r in out.select("doc_id", "copy_id").collect()
    )


def test_doremi_weights_drive_stratified_sample(spark):
    """The DoReMi loop's composition claim, proven end-to-end: the
    weight vector converts to per-domain keep rates (weight / max
    weight -- the largest-headroom domain keeps everything) and the
    sampled corpus's domain proportions track the weights."""
    from pg_auto_dw_spark.functions.sampling import (
        doremi_domain_weights,
        stratified_sample,
    )

    losses = spark.createDataFrame(
        [("web", 3.0, 2.0), ("code", 2.5, 2.4), ("wiki", 2.0, 2.2)],
        "domain string, proxy_loss double, ref_loss double",
    )
    w = {
        r["domain"]: r["weight"]
        for r in doremi_domain_weights(losses, lr=1.0, smoothing=0.1).collect()
    }
    assert abs(sum(w.values()) - 1.0) < 1e-9
    assert w["web"] > w["code"] > w["wiki"]  # excess 1.0 > 0.1 > 0
    top = max(w.values())
    rates = {d: v / top for d, v in w.items()}
    docs = spark.createDataFrame(
        [(i, ["web", "code", "wiki"][i % 3]) for i in range(9000)],
        "doc_id bigint, domain string",
    )
    kept = stratified_sample(docs, key_col="doc_id", rates=rates,
                             strata_col="domain").collect()
    counts = {}
    for r in kept:
        counts[r["domain"]] = counts.get(r["domain"], 0) + 1
    # 3000 docs per domain in; keep fractions must track rates (+-5%)
    for d, rate in rates.items():
        assert abs(counts.get(d, 0) / 3000 - rate) < 0.05, (d, counts)
    assert counts["web"] > counts["code"] > counts["wiki"]
