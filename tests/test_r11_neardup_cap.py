"""r10 VERDICT #1: the near-dup ingest's WITHIN-batch candidate join
must be hot-bucket star-capped (band_pair_candidates, the same
generator batch-mode minhash_lsh_candidates uses) so a
boilerplate-heavy micro-batch -- one band key shared by most of the
batch -- emits O(n) candidate pairs, not O(n^2), with verdicts
identical via connected-component transitivity."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.dedup import (
    band_pair_candidates,
    lsh_band_keys_wide,
    minhash_signatures_wide,
)
from pg_auto_dw_spark.streaming.jobs import neardup_ingest_apply
from pg_auto_dw_spark.warehouse import Warehouse

TEMPLATE = (
    "thank you for your purchase your order has been received and is "
    "being processed you will receive a confirmation email shortly "
    "with tracking details for your shipment from our warehouse team"
)
DISTINCT = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "stock markets rallied sharply as investors cheered earnings reports",
    "rain fell steadily across the northern valleys flooding several roads",
]


def _skewed_batch(spark, n_template=30):
    """n_template byte-identical boilerplate docs (ids 0..n-1) plus
    three genuinely distinct docs -- every template doc shares EVERY
    band key, the worst-case hot bucket."""
    rows = [(i, TEMPLATE) for i in range(n_template)]
    rows += [(1000 + j, t) for j, t in enumerate(DISTINCT)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_candidate_pairs_bounded_linear(spark):
    """Direct pin on the generator the ingest now uses: for a bucket of
    n docs with cap c < n, pairs per band are n-1 (star), never
    n*(n-1)/2. 30 docs x 4 bands, cap 8: <= 116 pairs after the
    cross-band distinct, vs 1740 uncapped."""
    n = 30
    batch = _skewed_batch(spark, n)
    wide = minhash_signatures_wide(batch, "text", "doc_id", 16, 5).filter(
        F.col("g0").isNotNull()
    )
    bands = lsh_band_keys_wide(wide, "doc_id", 4).localCheckpoint(eager=True)
    n_bands = bands.select("band").distinct().count()
    capped = band_pair_candidates(bands, max_bucket_size=8).count()
    uncapped = band_pair_candidates(bands, max_bucket_size=10_000).count()
    assert uncapped >= n * (n - 1) // 2  # the quadratic regime is real
    assert capped <= n_bands * (n - 1) + len(DISTINCT) * n_bands
    assert capped < uncapped


def test_skewed_batch_verdicts_identical_and_bounded(spark, tmp_path):
    """End-to-end: a boilerplate-heavy micro-batch under a small
    max_probe_bucket collapses to the SAME min-id canonical + same
    admitted set as the uncapped run (star edges keep the hot bucket
    one connected component)."""
    batch = _skewed_batch(spark, 30)

    wh_capped = Warehouse(spark, str(tmp_path / "wh_capped"))
    stats_capped = neardup_ingest_apply(
        wh_capped, "c.docs", batch, max_probe_bucket=8
    )
    wh_full = Warehouse(spark, str(tmp_path / "wh_full"))
    stats_full = neardup_ingest_apply(
        wh_full, "c.docs", batch, max_probe_bucket=100_000
    )

    assert stats_capped == stats_full
    assert stats_capped["n_within_dups"] == 29
    assert stats_capped["n_new"] == 4  # min-id template + 3 distinct
    kept_capped = {r["doc_id"] for r in wh_capped.read("c.docs").collect()}
    kept_full = {r["doc_id"] for r in wh_full.read("c.docs").collect()}
    assert kept_capped == kept_full == {0, 1000, 1001, 1002}


def test_cross_batch_still_caught_under_cap(spark, tmp_path):
    """The cap changes witness choice only: a later near-copy of the
    boilerplate is still rejected against the capped-run ledger."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    neardup_ingest_apply(wh, "c.docs", _skewed_batch(spark, 30),
                         max_probe_bucket=8)
    near = TEMPLATE.replace("warehouse team", "fulfillment crew")
    resub = spark.createDataFrame([(5000, near)], "doc_id bigint, text string")
    stats = neardup_ingest_apply(wh, "c.docs", resub, max_probe_bucket=8)
    assert stats["n_cross_dups"] == 1 and stats["n_new"] == 0
