"""Cross-batch near-duplicate ingest (streaming/jobs.py
neardup_ingest_apply + jsonl_neardup_ingest_stream): the MinHash band
ledger probed with the zero-ledger-shuffle join direction."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.streaming.jobs import (
    jsonl_neardup_ingest_stream,
    neardup_ingest_apply,
)
from pg_auto_dw_spark.warehouse import Warehouse

BASE = (
    "the quick brown fox jumps over the lazy dog while the river "
    "runs quietly past the old mill and the miller watches the wheel "
    "turn slowly in the afternoon sun as travelers pass on the road"
)
NEAR = BASE.replace("afternoon sun", "evening light")  # small edit
OTHER = (
    "stock markets rallied sharply today as investors cheered strong "
    "quarterly earnings reports from the largest technology companies "
    "and central banks signalled steady interest rate policy ahead"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_within_batch_collapse(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats = neardup_ingest_apply(
        wh, "c.docs", _df(spark, [(1, BASE), (2, NEAR), (3, OTHER)])
    )
    assert stats["n_batch"] == 3
    assert stats["n_within_dups"] == 1
    assert stats["n_cross_dups"] == 0
    assert stats["n_new"] == 2
    kept = {r["doc_id"] for r in wh.read("c.docs").collect()}
    assert kept == {1, 3}  # min-id canonical survives
    # ledger rows exist only for admitted docs
    assert {r["doc_id"] for r in wh.read("c.docs.minhash").collect()} == {1, 3}


def test_cross_batch_near_dup_dropped(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    neardup_ingest_apply(wh, "c.docs", _df(spark, [(1, BASE)]))
    stats = neardup_ingest_apply(
        wh, "c.docs", _df(spark, [(10, NEAR), (11, OTHER)]),
        dupes_table="c.dupes",
    )
    assert stats["n_cross_dups"] == 1 and stats["n_new"] == 1
    kept = {r["doc_id"] for r in wh.read("c.docs").collect()}
    assert kept == {1, 11}
    dupes = wh.read("c.dupes").collect()
    assert len(dupes) == 1
    assert dupes[0]["doc_id"] == 10 and dupes[0]["matched_id"] == 1
    # a THIRD wave resubmitting the near-copy is still caught (ledger
    # grew by batch 2's survivor, not its dup)
    stats3 = neardup_ingest_apply(wh, "c.docs", _df(spark, [(20, NEAR)]))
    assert stats3["n_cross_dups"] == 1 and stats3["n_new"] == 0


def test_unsigned_docs_admitted_unchecked(spark, tmp_path):
    """NULL text yields no shingles (short text still gets one
    whole-text shingle, so it IS checked); unsigned docs are admitted
    with no ledger rows."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats = neardup_ingest_apply(
        wh, "c.docs",
        _df(spark, [(1, BASE), (2, None), (3, "hi")]),
    )
    assert stats["n_unsigned"] == 1 and stats["n_new"] == 3
    assert wh.read("c.docs").count() == 3
    # the NULL doc leaves NO ledger rows; the short doc does
    assert {r["doc_id"] for r in wh.read("c.docs.minhash").collect()} == {1, 3}


def test_exact_resubmission_is_also_caught(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    neardup_ingest_apply(wh, "c.docs", _df(spark, [(1, BASE)]))
    stats = neardup_ingest_apply(wh, "c.docs", _df(spark, [(9, BASE)]))
    assert stats["n_cross_dups"] == 1 and stats["n_new"] == 0


def test_jsonl_neardup_stream_end_to_end(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        f'{{"doc_id": 1, "text": "{BASE}"}}\n'
        "not json at all\n"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def run():
        q = jsonl_neardup_ingest_stream(
            spark, str(src), schema, wh, "lz.docs", "lz.quarantine",
            str(tmp_path / "ckpt"), dupes_table="lz.dupes",
        )
        q.awaitTermination(120)

    run()
    assert wh.read("lz.docs").count() == 1
    assert wh.read("lz.quarantine").count() == 1
    (src / "b.jsonl").write_text(
        f'{{"doc_id": 7, "text": "{NEAR}"}}\n'
        f'{{"doc_id": 8, "text": "{OTHER}"}}\n'
    )
    run()
    kept = {r["doc_id"] for r in wh.read("lz.docs").collect()}
    assert kept == {1, 8}  # near-copy dropped, new doc admitted
    assert wh.read("lz.dupes").first()["matched_id"] == 1
    # restart over the same sources: exact no-op
    run()
    assert wh.read("lz.docs").count() == 2
    assert wh.read("lz.dupes").count() == 1


def test_neardup_transaction_is_all_or_nothing(spark, tmp_path, monkeypatch):
    """A failure while staging ANY of the three tables (corpus, bands,
    signatures) must leave the warehouse at the prior batch's state --
    a band row without its doc would silently eat future near-copies
    of a document that was never admitted."""
    import pg_auto_dw_spark.warehouse as wh_mod

    wh = Warehouse(spark, str(tmp_path / "wh"))
    neardup_ingest_apply(wh, "c.docs", _df(spark, [(1, BASE)]))
    before = {
        t: {tuple(r) for r in wh.read(t).collect()}
        for t in ("c.docs", "c.docs.bands", "c.docs.minhash")
    }

    real_append = wh_mod._Transaction.append

    def boom(self, name, df):
        if name == "c.docs.minhash":
            raise RuntimeError("injected crash while staging signatures")
        return real_append(self, name, df)

    monkeypatch.setattr(wh_mod._Transaction, "append", boom)
    try:
        neardup_ingest_apply(wh, "c.docs", _df(spark, [(50, OTHER)]))
        raise AssertionError("expected the injected failure to propagate")
    except RuntimeError:
        pass
    monkeypatch.setattr(wh_mod._Transaction, "append", real_append)
    wh2 = Warehouse(spark, str(tmp_path / "wh"))  # recovery runs at init
    for t, rows in before.items():
        assert {tuple(r) for r in wh2.read(t).collect()} == rows, t
    # and the aborted batch can simply be retried
    stats = neardup_ingest_apply(wh2, "c.docs", _df(spark, [(50, OTHER)]))
    assert stats["n_new"] == 1


def test_bucketed_sidecars_same_verdicts_and_loud_mismatch(spark, tmp_path):
    """Opt-in partitioned sidecars (n_sidecar_parts) must produce the
    SAME dedup verdicts as the default layout, and a layout-mismatched
    call must fail loudly instead of silently mis-probing."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    neardup_ingest_apply(
        wh, "c.docs", _df(spark, [(1, BASE)]), n_sidecar_parts=16
    )
    assert "__bucket" in wh.read("c.docs.bands").columns
    stats = neardup_ingest_apply(
        wh, "c.docs", _df(spark, [(10, NEAR), (11, OTHER)]),
        n_sidecar_parts=16,
    )
    assert stats["n_cross_dups"] == 1 and stats["n_new"] == 1
    assert {r["doc_id"] for r in wh.read("c.docs").collect()} == {1, 11}
    with pytest.raises(ValueError, match="layout mismatch"):
        neardup_ingest_apply(wh, "c.docs", _df(spark, [(20, OTHER)]))


def test_neardup_zone_monitor_table(spark, tmp_path):
    """r13 back-port of the media zone's monitor sidecar: a
    boilerplate-skewed batch (one band bucket past the cap) lands
    over-cap audit rows in the same transaction; a healthy batch lands
    none; verdicts are identical with the monitor on or off."""
    skewed = [(i, BASE) for i in range(40)] + [(100, OTHER)]
    stats_by = {}
    for monitored in (False, True):
        wh = Warehouse(spark, str(tmp_path / f"wh{monitored}"))
        stats_by[monitored] = neardup_ingest_apply(
            wh, "c.docs", _df(spark, skewed),
            max_probe_bucket=8,
            monitor_table="c.buckets" if monitored else None,
        )
        if monitored:
            mon = wh.read("c.buckets").collect()
            assert mon and all(r["n"] > 8 for r in mon)
            assert all(r["pairs_suppressed"] > 0 for r in mon)
    assert stats_by[False] == stats_by[True]
    # healthy follow-up batch: zero new monitor rows
    wh = Warehouse(spark, str(tmp_path / "whTrue"))
    n_before = wh.read("c.buckets").count()
    neardup_ingest_apply(
        wh, "c.docs", _df(spark, [(200, OTHER + " fresh tail")]),
        max_probe_bucket=8, monitor_table="c.buckets",
    )
    assert wh.read("c.buckets").count() == n_before


def test_within_batch_members_get_dupes_lineage(spark, tmp_path):
    """r13 ADVICE (applied to the text zone too): within-batch cluster
    members land in dupes_table with matched_id naming the surviving
    corpus row -- the admitted canonical for batch-only clusters, and
    TRANSITIVELY the corpus witness when the canonical itself
    cross-matched (11 rides 10's verdict and points at corpus 1, not
    at the never-admitted 10)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    neardup_ingest_apply(wh, "c.docs", _df(spark, [(1, BASE)]))
    long2 = (
        "the harbor filled with sails at dawn as fishermen hauled their "
        "nets onto the weathered docks and gulls circled above the market "
        "stalls where merchants called out prices for the morning catch"
    )
    long2_near = long2.replace("morning catch", "daily haul")
    stats = neardup_ingest_apply(
        wh, "c.docs",
        _df(spark, [(10, NEAR), (11, NEAR), (30, long2), (31, long2_near)]),
        dupes_table="c.dupes",
    )
    assert stats["n_within_dups"] == 2   # 11 under 10, 31 under 30
    assert stats["n_cross_dups"] == 1    # canonical 10 matches corpus 1
    assert stats["n_new"] == 1           # canonical 30 admitted
    lineage = {r["doc_id"]: r["matched_id"] for r in wh.read("c.dupes").collect()}
    assert lineage == {10: 1, 11: 1, 31: 30}
    kept = {r["doc_id"] for r in wh.read("c.docs").collect()}
    assert kept == {1, 30} and set(lineage.values()) <= kept
