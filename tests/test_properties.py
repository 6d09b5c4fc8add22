"""Property-based checks (hypothesis) for the two correctness surfaces
SURVEY.md section 7 calls the hard parts: PG-style text rendering
(hash parity) and SCD2 merge invariants."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.hashing import pg_text_expr


@pytest.fixture(scope="module")
def ddb():
    return duckdb.connect()


# pg_text_expr's double contract covers values with <= 2 fractional
# decimal digits (the money-like columns DV hash-diffs render). At
# exact .xx5 rounding ties the engines disagree (Spark decimal cast is
# HALF_UP; DuckDB's double->decimal tie behavior is neither HALF_UP nor
# HALF_EVEN consistently -- found by hypothesis with 167772.625), so
# the contract deliberately excludes 3+-decimal values.
cent_doubles = st.integers(min_value=-(10**14), max_value=10**14).map(
    lambda cents: cents / 100
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=st.lists(cent_doubles, min_size=1, max_size=20))
def test_double_rendering_matches_duckdb(spark, ddb, values):
    """pg_text_expr(double) must equal DuckDB's DECIMAL(38,2) rendering
    for every 2-decimal value -- the byte-level contract the DV
    hash-diffs depend on."""
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    got = [
        r[0]
        for r in df.select(pg_text_expr(F.col("x"), "double")).collect()
    ]
    want = [
        ddb.execute(
            "SELECT CAST(CAST(? AS DECIMAL(38,2)) AS VARCHAR)", [v]
        ).fetchone()[0]
        for v in values
    ]
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ints=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=20
    )
)
def test_bigint_rendering_matches_duckdb(spark, ddb, ints):
    df = spark.createDataFrame([(v,) for v in ints], ["x"])
    got = [r[0] for r in df.select(pg_text_expr(F.col("x"), "bigint")).collect()]
    want = [str(v) for v in ints]
    assert got == want


# --- SCD2 invariants over random transition sequences ------------------

COLS = ["a", "b", "c", "d"]
TYPES = ["int", "text", "smallint"]


@st.composite
def snapshots(draw):
    """A random sequence of catalog snapshots: each is a subset of COLS
    with a type per column."""
    n_steps = draw(st.integers(min_value=1, max_value=4))
    steps = []
    for _ in range(n_steps):
        present = draw(st.sets(st.sampled_from(COLS), min_size=0, max_size=4))
        steps.append({c: draw(st.sampled_from(TYPES)) for c in sorted(present)})
    return steps


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(steps=snapshots())
def test_scd2_invariants_random_sequences(spark, tmp_path_factory, steps):
    """After any sequence of merges:
    - at most one current='Y' row per key;
    - live rows (Y/N-deleted) match the last snapshot exactly;
    - closed rows all carry valid_to;
    - pk_source_objects stays unique."""
    import datetime

    from pg_auto_dw_spark.catalog.introspect import SNAPSHOT_SCHEMA
    from pg_auto_dw_spark.catalog.scd2 import (
        ensure_table,
        merge_snapshot,
    )
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("scd2prop")))
    ensure_table(wh)
    ordinal = {c: i + 1 for i, c in enumerate(COLS)}
    for step_no, snap in enumerate(steps):
        rows = [
            (1, "s", "NA", 10, "t", "NA", ordinal[c], c, typ, None, typ,
             "NA", 0, "NA", 0)
            for c, typ in snap.items()
        ]
        snap_df = spark.createDataFrame(rows, SNAPSHOT_SCHEMA)
        merge_snapshot(wh, snap_df, as_of=datetime.datetime(2024, 1, 1 + step_no))

    final = wh.read("auto_dw.source_objects").collect()
    # pk uniqueness
    pks = [r["pk_source_objects"] for r in final]
    assert len(pks) == len(set(pks))
    # one current row per key
    cur = [r for r in final if r["current_flag"] == "Y"]
    keys = [(r["schema_oid"], r["table_oid"], r["column_ordinal_position"]) for r in cur]
    assert len(keys) == len(set(keys))
    # live view == last snapshot
    last = steps[-1]
    live = {
        r["column_name"]: r["column_type_name"]
        for r in cur
        if r["deleted_flag"] == "N"
    }
    assert live == last
    # closed rows carry valid_to
    assert all(r["valid_to"] is not None for r in final if r["current_flag"] == "N")


# --- data-scale partitioned SCD2 dim merge invariants -------------------


@st.composite
def dim_batches(draw):
    """Random CDC batch sequence over an 8-key dimension: each batch
    presents a subset of keys with a value version 0-3."""
    n_steps = draw(st.integers(min_value=1, max_value=3))
    return [
        {
            k: draw(st.integers(min_value=0, max_value=3))
            for k in sorted(draw(st.sets(st.sampled_from(range(8)), min_size=1, max_size=8)))
        }
        for _ in range(n_steps)
    ]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(steps=dim_batches())
def test_scd2_dim_invariants_random_batches(spark, tmp_path_factory, steps):
    """After any CDC batch sequence through the partitioned merge:
    - exactly one current row per key, valued as the last batch that
      presented it (reference model simulated in Python);
    - closed-history row count == number of actual value changes;
    - every closed row carries valid_to;
    - re-merging the final batch is a no-op."""
    import datetime

    from pg_auto_dw_spark.build.scd2_dim import initial_load, merge_batch, with_bucket
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("dimprop")))
    init = with_bucket(
        spark.createDataFrame([(k, 0) for k in range(8)], "c_custkey long, v long"),
        ["c_custkey"],
        4,
    )
    initial_load(
        wh, "dim.t", init, ["c_custkey"], ["v"],
        as_of=datetime.datetime(2024, 1, 1),
    )

    cur_val = {k: 0 for k in range(8)}
    n_changes = 0
    for step_no, batch in enumerate(steps):
        bdf = with_bucket(
            spark.createDataFrame(list(batch.items()), "c_custkey long, v long"),
            ["c_custkey"],
            4,
        )
        merge_batch(
            wh, "dim.t", bdf, ["c_custkey"], ["v"],
            as_of=datetime.datetime(2024, 2, 1 + step_no),
        )
        for k, v in batch.items():
            if v != cur_val[k]:
                n_changes += 1
                cur_val[k] = v

    def state():
        rows = wh.read("dim.t").collect()
        cur = {r["c_custkey"]: r["v"] for r in rows if r["current_flag"] == "Y"}
        closed = [r for r in rows if r["current_flag"] == "N"]
        return rows, cur, closed

    rows, cur, closed = state()
    assert cur == cur_val  # one current row per key, correctly valued
    assert len([r for r in rows if r["current_flag"] == "Y"]) == 8
    assert len(closed) == n_changes
    assert all(r["valid_to"] is not None for r in closed)

    # idempotency: re-merging the final batch changes nothing
    last = steps[-1]
    bdf = with_bucket(
        spark.createDataFrame(list(last.items()), "c_custkey long, v long"),
        ["c_custkey"],
        4,
    )
    merge_batch(
        wh, "dim.t", bdf, ["c_custkey"], ["v"],
        as_of=datetime.datetime(2024, 3, 1),
    )
    rows2, cur2, closed2 = state()
    assert cur2 == cur and len(closed2) == len(closed) and len(rows2) == len(rows)


# -- as-of join: random version/probe sequences vs a Python model ----------

_asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),      # key
        st.integers(min_value=0, max_value=5000),   # seconds offset
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rights=_asof_rows, lefts=_asof_rows)
def test_asof_join_matches_model(spark, rights, lefts):
    """asof_join (union + carry-forward window) must agree with the
    obvious O(n*m) reference model on arbitrary key/timestamp
    sequences, including duplicate probe instants and probes at
    exactly a version instant (inclusive semantics)."""
    import datetime

    from pg_auto_dw_spark.functions.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    ts = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    # dedupe right per (key, instant): the operator's documented precondition
    rmap = {}
    for k, s in rights:
        rmap[(k, s)] = max(rmap.get((k, s), -1), s)
    right_rows = [(k, ts(s), f"v{k}_{s}") for (k, s) in sorted(rmap)]
    left_rows = [(k, i, ts(s)) for i, (k, s) in enumerate(lefts)]

    right = spark.createDataFrame(right_rows, ["k", "rts", "val"])
    left = spark.createDataFrame(left_rows, ["k", "pid", "lts"])
    got = {
        r["pid"]: r["val"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", suffix=""
        ).collect()
    }

    for k, pid, lt in left_rows:
        cands = [(rt, v) for (rk, rt, v) in right_rows if rk == k and rt <= lt]
        expected = max(cands)[1] if cands else None
        assert got[pid] == expected, (k, pid, lt)


# -- binned range join: random interval/timestamp sequences vs model -------

_range_secs = st.lists(
    st.floats(min_value=0, max_value=3000, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=20,
)
_bounds = st.tuples(
    st.integers(min_value=-600, max_value=600),
    st.integers(min_value=-600, max_value=600),
).filter(lambda b: b[1] > b[0])


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lsecs=_range_secs, rsecs=_range_secs, bounds=_bounds)
def test_range_join_matches_model(spark, lsecs, rsecs, bounds):
    """range_join (binned equi-join + residual filter) must agree with
    the O(n*m) model for arbitrary offsets and interval bounds,
    including negative-only and straddling-zero intervals."""
    import datetime

    from pg_auto_dw_spark.functions.rangejoin import range_join

    lo, hi = bounds
    base = datetime.datetime(2024, 1, 1)
    ts = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    # microsecond-quantize the model exactly as timestamps will be
    q = lambda s: round(s * 1e6) / 1e6  # noqa: E731
    lsecs = [q(s) for s in lsecs]
    rsecs = [q(s) for s in rsecs]
    left = spark.createDataFrame(
        [(i, ts(s)) for i, s in enumerate(lsecs)], ["lid", "lts"]
    )
    right = spark.createDataFrame(
        [(i, ts(s)) for i, s in enumerate(rsecs)], ["rid", "rts"]
    )
    got = sorted(
        (r.lid, r.rid)
        for r in range_join(left, right, "lts", "rts", lo, hi).collect()
    )
    want = sorted(
        (li, ri)
        for li, ls in enumerate(lsecs)
        for ri, rs in enumerate(rsecs)
        if ls + lo <= rs <= ls + hi
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd\tx1!.\n"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=25,
    ),
    seq_tokens=st.sampled_from([8, 64, 512]),
)
def test_pack_sequences_invariants_random_corpora(spark, texts, seq_tokens):
    """For ANY corpus: the placement is a gapless permutation prefix-sum
    of the per-doc token counts, seq coordinates derive from the
    offset, and every doc appears exactly once."""
    from pg_auto_dw_spark.functions.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    placed = pack_sequences(docs, seq_tokens=seq_tokens).collect()
    assert len({r["doc_id"] for r in placed}) == len(placed) == len(texts)
    cum = 0
    for r in sorted(placed, key=lambda r: r["global_offset"]):
        assert r["global_offset"] == cum
        assert r["seq_id"] == cum // seq_tokens
        assert r["seq_offset"] == cum % seq_tokens
        assert r["n_bpe_tokens"] >= 0
        cum += r["n_bpe_tokens"]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("ab c"), min_size=0, max_size=30),
        min_size=1,
        max_size=15,
    )
)
def test_bigram_logprob_model_invariants(spark, texts):
    """For ANY corpus: scores are finite and <= 0 (probabilities),
    a doc whose every bigram is its prefix's ONLY continuation scores
    exactly 0 contribution for those pairs, and n_bigrams equals
    token count minus one for every emitted doc."""
    import math

    from pg_auto_dw_spark.functions.corpus import word_tokens
    from pg_auto_dw_spark.functions.text import bigram_logprob

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select("doc_id", word_tokens(F.col("text")).alias("t")).collect()
    }
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    for i, t in toks.items():
        if len(t) < 2:
            assert i not in out
        else:
            assert out[i]["n_bigrams"] == len(t) - 1
            assert out[i]["avg_logprob"] <= 1e-12
            assert math.isfinite(out[i]["avg_logprob"])


# --- round-8 session-2 operator invariants -------------------------------

words_st = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=5), min_size=0, max_size=30
).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(words_st, min_size=1, max_size=12),
    bench_idx=st.sets(st.integers(min_value=0, max_value=11), max_size=4),
    n=st.integers(min_value=2, max_value=4),
)
def test_bloom_never_false_negative(spark, texts, bench_idx, n):
    """For ANY corpus, benchmark subset, and gram size: every document
    with a true gram overlap must be bloom-flagged (the contract that
    makes filter-at-ingest safe)."""
    from pg_auto_dw_spark.functions.corpus import (
        bloom_contamination_flags,
        word_ngrams,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bench = docs.filter(F.col("doc_id").isin([int(i) for i in bench_idx] or [-1]))
    if bench.count() == 0:
        return
    # smallest legal bitset to maximize false-positive pressure
    flags = {
        r["doc_id"]: (r["bloom_hit"], r["exact_hit"])
        for r in bloom_contamination_flags(
            docs, bench, n=n, m_bits=1024, with_exact=True
        ).collect()
    }
    assert all(hit for hit, exact in flags.values() if exact)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(words_st.filter(lambda t: t.strip()), min_size=1, max_size=8))
def test_bpe_apply_count_bounds(spark, texts):
    """Exact BPE counts are bounded: at least 1 token per word, at most
    chars+1 per word (the untrained ceiling), under any learned merges."""
    from pg_auto_dw_spark.functions.tokenizer import bpe_apply, bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=30)
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_apply(docs, merges).collect()}
    for i, t in enumerate(texts):
        ws = [w for w in t.split() if w]
        lo = len(ws)
        hi = sum(len(w) + 1 for w in ws)
        assert lo <= got[i] <= hi


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)),
        min_size=1,
        max_size=40,
    )
)
def test_histogram_counts_every_nonnull_once(spark, vals):
    from pg_auto_dw_spark.functions.sketch import equi_width_histogram

    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    rows = equi_width_histogram(df, ["k"], "v", 0.0, 100.0, 10).collect()
    assert sum(r["cnt"] for r in rows) == sum(1 for v in vals if v is not None)
    assert all(0 <= r["bucket"] <= 9 for r in rows)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    old_rows=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.one_of(st.none(), st.text(alphabet="xyz", max_size=3)),
        max_size=20,
    ),
    new_rows=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.one_of(st.none(), st.text(alphabet="xyz", max_size=3)),
        max_size=20,
    ),
)
def test_snapshot_diff_matches_brute_force(spark, old_rows, new_rows):
    """For ANY pair of keyed snapshots (NULL values included), the diff
    classification equals the set-theoretic ground truth, and
    diff(a, a) is empty."""
    from pg_auto_dw_spark.functions.diff import snapshot_diff

    def df_of(d):
        return spark.createDataFrame(
            [(k, v) for k, v in d.items()] or [(None, None)], "id long, v string"
        ).filter(F.col("id").isNotNull())

    old, new = df_of(old_rows), df_of(new_rows)
    got = {r["id"]: r["change_type"] for r in snapshot_diff(old, new, ["id"]).collect()}
    want = {}
    for k in set(old_rows) | set(new_rows):
        if k not in new_rows:
            want[k] = "deleted"
        elif k not in old_rows:
            want[k] = "inserted"
        elif old_rows[k] != new_rows[k]:
            want[k] = "changed"
    assert got == want
    assert snapshot_diff(old, old, ["id"]).count() == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.lists(
                st.sampled_from("alpha beta gamma delta epsilon".split()),
                min_size=0,
                max_size=12,
            ).map(" ".join),
        ),
        min_size=1,
        max_size=25,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_source_overlap_matrix_matches_brute_force(spark, texts, n):
    """The matrix must equal the set-theoretic ground truth computed
    doc-by-doc in Python: per-source distinct gram sets, pairwise
    intersections, zero-overlap pairs absent."""
    from pg_auto_dw_spark.functions.corpus import source_overlap_matrix

    docs = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(texts)],
        "doc_id bigint, text string, source string",
    )
    got = {
        (r["src_a"], r["src_b"]): (r["shared_grams"], r["grams_a"], r["grams_b"])
        for r in source_overlap_matrix(docs, n=n).collect()
    }
    vocab: dict[str, set] = {}
    for s, t in texts:
        toks = t.split()
        grams = {
            " ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))
        }
        vocab.setdefault(s, set()).update(grams)
    want = {}
    for a, ga in vocab.items():
        for b, gb in vocab.items():
            shared = len(ga & gb)
            if shared:
                want[(a, b)] = (shared, len(ga), len(gb))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9),
                  st.one_of(st.none(), st.floats(min_value=-100, max_value=100))),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    ),
    cuts=st.lists(
        st.floats(min_value=-90, max_value=90), min_size=1, max_size=3, unique=True
    ).map(sorted),
)
def test_quality_binned_sample_matches_model(spark, rows, cuts):
    """Keep decision == the pure-Python model: rank(key) < rate[bin] *
    MODULUS, NULL scores dropped, bin = #thresholds <= score."""
    from pg_auto_dw_spark.functions.sampling import (
        MODULUS,
        MULTIPLIER,
        quality_binned_sample,
    )

    rates = [i / len(cuts) for i in range(len(cuts) + 1)]
    df = spark.createDataFrame(rows, "doc_id bigint, score double")
    got = {
        r["doc_id"]: r["quality_bin"]
        for r in quality_binned_sample(df, "doc_id", "score", cuts, rates).collect()
    }
    want = {}
    for key, score in rows:
        if score is None:
            continue
        b = sum(1 for c in cuts if score >= c)
        if (key * MULTIPLIER) % MODULUS < int(rates[b] * MODULUS):
            want[key] = b
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=80),
    budget=st.integers(min_value=1, max_value=512),
    n_salts=st.integers(min_value=1, max_value=8),
)
def test_inference_batch_plan_invariants(spark, lengths, budget, n_salts):
    """Every doc planned exactly once; every batch band-homogeneous;
    every batch's padded cost fits the budget unless it is a one-row
    batch of an over-budget doc; bands are the next power of two."""
    from pg_auto_dw_spark.functions.batching import (
        batch_plan_stats,
        inference_batch_plan,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)],
        "doc_id bigint, text string",
    )
    plan = inference_batch_plan(docs, budget, n_salts=n_salts)
    rows = plan.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(lengths)))
    for r in rows:
        lo = max(r["n_tokens"], 1)
        assert r["band_tokens"] >= lo and r["band_tokens"] < 2 * lo + 1
        assert r["band_tokens"] & (r["band_tokens"] - 1) == 0
    for b in batch_plan_stats(plan).collect():
        assert b["padded_tokens"] <= budget or b["n_rows"] == 1
        assert 0 <= b["waste_pct_e4"] <= 10000
