"""Reference README Act-2 demo parity (r5 VERDICT directive 6): the
seller-shaped source with the reference's PLANTED BAIT -- an email
address in the ``city`` column (reference:
extension/src/utility/sql/sample_source_tables/seller.sql:28) and a
malformed zip ('01026d', seller.sql last row) -- driven through the
full crawl -> classify -> status -> governance-fix -> go() pipeline
with the deterministic stub.

Asserted parity points (reference README.md:100-133):
- the table is held back ("Requires Attention") because the zip
  column's type admits extended zips (Act-2 steps 1-2);
- the data-side scans surface both planted baits the metadata-only
  classifier cannot see (pii_scan / format_violations);
- after the user's governance fixes the build proceeds and the PII
  column lands in the ``_sensitive`` satellite split
  (dv_builder.rs:406-416 parity).
"""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.api import AutoDW
from pg_auto_dw_spark.catalog.profile import format_violations, pii_scan
from pg_auto_dw_spark.catalog.registry import SourceRegistry, TableMeta

SELLER_SCHEMA = T.StructType(
    [
        T.StructField("seller_id", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("zip_5", T.StringType()),
    ]
)

# seller.sql shapes: normal rows, the email-in-city bait row
# (seller.sql:28) and the malformed-zip bait row (last row).
SELLER_ROWS = [
    ("9449f25aeaf531019b76999ea49a6949", "rio de janeiro", "RJ", "21040"),
    ("9bc484c87d79cd4874e05ca182658045", "sao paulo", "SP", "02422"),
    ("3442f8959a84dea7ee197c632cb2df15", "campinas", "SP", "13023"),
    ("4b5f66b7adcf57f1ecc0d3c07dd6b177", "vendas@creditparts.com.br", "PR", "87025"),
    ("b00af24704019bd2e1b335e70ad11f7c", "salvador", "BA", "40130"),
    ("6da1992f915d77be95d7fa48b36904af", "sao paulo", "SP", "01026d"),
]


class _Clock:
    """Advancing clock: crawl/classify rounds need valid_from to move
    past the previous round's response timestamps."""

    def __init__(self):
        self.now = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def __call__(self):
        return self.now

    def tick(self, minutes=5):
        self.now += datetime.timedelta(minutes=minutes)


def _seller_adw(spark, warehouse_dir):
    reg = SourceRegistry(
        [TableMeta("main", "seller", pk_columns=("seller_id",))]
    )
    clock = _Clock()
    adw = AutoDW(spark, warehouse_dir, registry=reg, clock=clock)
    adw.register_source(
        "main", "seller", spark.createDataFrame(SELLER_ROWS, SELLER_SCHEMA)
    )
    return adw, clock


def test_act2_zip_requires_attention_blocks_the_table(spark, warehouse_dir):
    adw, _ = _seller_adw(spark, warehouse_dir)
    adw.source_include("main", "seller")
    adw.crawl()
    assert adw.classify_pending() == 4

    # Act-2 step 1: identify the held-back table
    st = {r["table"]: r["status"] for r in adw.source_table().collect()}
    assert st["seller"] == "Requires Attention"

    # Act-2 step 2: root cause -- the zip column, with the reference's
    # extended-zip reasoning, below the acceptance threshold
    by_col = {r["column"]: r for r in adw.source_column().collect()}
    assert by_col["zip_5"]["status"] == "Requires Attention"
    assert "extended zip" in by_col["zip_5"]["status_response"]
    assert by_col["zip_5"]["confidence_level"] == "72%"
    assert by_col["city"]["status"] == "Ready to Deploy"

    # the build gate is per-COLUMN (reference queries.rs:324-415
    # WHERE status = 'Ready to Deploy'): the table builds, but the
    # held-back zip_5 column is WITHHELD from the warehouse until
    # governance clears it
    adw.go(load_ts=datetime.datetime(2024, 6, 2))
    assert adw.wh.exists("dw.hub_seller")
    sat_cols = set(adw.wh.read("dw.sat_seller").columns)
    assert "zip_5" not in sat_cols and "city" in sat_cols
    assert not adw.wh.exists("dw.sat_seller_sensitive")  # nothing PII-ready yet


def test_data_side_scans_surface_the_planted_bait(spark, warehouse_dir):
    seller = spark.createDataFrame(SELLER_ROWS, SELLER_SCHEMA)

    scan = {
        (r["column_name"], r["pattern"]): r["n_matching_rows"]
        for r in pii_scan(seller).collect()
    }
    # the email bait hides in the innocently-named city column --
    # invisible to the metadata-only classifier, caught by the value scan
    assert scan[("city", "email")] == 1
    assert scan[("seller_id", "email")] == 0
    assert scan[("zip_5", "email")] == 0
    # the all-clear rows are present too (zero counts are information)
    assert ("state", "phone") in scan

    viol = {r["value"]: r["n_rows"] for r in
            format_violations(seller, "zip_5", "[0-9]{5}").collect()}
    assert viol == {"01026d": 1}  # the malformed-zip bait, exactly


def test_act3_governance_fix_unblocks_and_splits_sensitive(spark, warehouse_dir):
    adw, clock = _seller_adw(spark, warehouse_dir)
    adw.source_include("main", "seller")
    adw.crawl()
    adw.classify_pending()

    # governance decisions, informed by the scans: zip_5 is declared
    # 5-digit-only (not sensitive); city carries the planted email, so
    # it IS sensitive despite its innocent name. The context updates
    # change the crawled column comments -> new catalog versions ->
    # the table re-pends (the reference's ALTER TABLE ... TYPE
    # VARCHAR(5) flows through the same re-crawl/re-classify loop).
    adw.update_context(
        "main.seller.zip_5",
        {"description": "5-digit zip only", "sensitive": False},
    )
    adw.update_context(
        "main.seller.city",
        {"description": "free text; value scan found an email", "sensitive": True},
    )
    clock.tick()
    adw.crawl()
    clock.tick()
    assert adw.classify_pending() == 4  # whole table re-classified

    by_col = {r["column"]: r for r in adw.source_column().collect()}
    assert by_col["zip_5"]["status"] == "Ready to Deploy"
    assert by_col["city"]["status"] == "Ready to Deploy"
    st = {r["table"]: r["status"] for r in adw.source_table().collect()}
    assert st["seller"] == "Ready to Deploy"

    # the build proceeds; the sensitive split fires on the bait column
    adw.go(load_ts=datetime.datetime(2024, 6, 2))
    dv = adw.latest_dv_schema()
    assert set(dv.business_keys[0].satellites()) == {"seller", "seller_sensitive"}
    sat = adw.wh.read("dw.sat_seller")
    sat_s = adw.wh.read("dw.sat_seller_sensitive")
    assert "city" in sat_s.columns and "city" not in sat.columns
    assert "zip_5" in sat.columns and "zip_5" not in sat_s.columns
    assert sat.count() == len(SELLER_ROWS)
    assert sat_s.count() == len(SELLER_ROWS)
