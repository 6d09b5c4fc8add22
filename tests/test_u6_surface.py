"""U6 docs-only surface: health(), update_context(), go() variants
(reference: extension/docs/sql_functions/{health,update_context,go}.md)."""

from pyspark.sql import functions as F

from tests.test_end_to_end import LOAD_TS, make_autodw


def test_dry_run_renders_ddl_and_persists_nothing(spark, warehouse_dir, sf_dir):
    adw = make_autodw(spark, warehouse_dir, sf_dir)
    adw.source_include("main", "customer")
    adw.classify_pending()

    msg = adw.go("DryRun")
    assert "DryRun" in msg and "CREATE TABLE dw.hub_customer" in msg
    assert "hub_customer: 150 keys staged" in msg
    # nothing persisted
    assert adw.wh.read("auto_dw.build_call").count() == 0
    assert adw.wh.read("auto_dw.dv_repo").count() == 0
    assert not adw.wh.exists("dw.hub_customer")


def test_push_table_reloads_single_table(spark, warehouse_dir, sf_dir):
    adw = make_autodw(spark, warehouse_dir, sf_dir)
    adw.source_include("main", "customer")
    adw.classify_pending()
    adw.go(load_ts=LOAD_TS)
    n = adw.wh.read("dw.hub_customer").count()

    # push with no new data -> no growth
    msg = adw.go("Push-Table", "main.customer", load_ts=LOAD_TS)
    assert "hub +0" in msg
    assert adw.wh.read("dw.hub_customer").count() == n

    # new source rows -> only they load
    extra = adw.resolve_source("main", "customer").withColumn(
        "c_custkey", F.col("c_custkey") + 1_000_000
    )
    adw.register_source("main", "customer", extra)
    msg = adw.go("Push-Table", "main.customer", load_ts=LOAD_TS)
    assert "hub +150" in msg
    assert adw.wh.read("dw.hub_customer").count() == n + 150

    # unknown table
    assert "not part" in adw.go("Push-Table", "main.nope")


def test_health_reports_components(spark, warehouse_dir, sf_dir):
    adw = make_autodw(spark, warehouse_dir, sf_dir)
    h0 = {r["component"]: r for r in adw.health().collect()}
    assert h0["catalog_crawl"]["status"] == "IDLE"
    adw.source_include("main", "customer")
    h1 = {r["component"]: r for r in adw.health().collect()}
    assert h1["catalog_crawl"]["status"] == "OK"
    assert h1["transformer"]["status"] == "PENDING"
    adw.classify_pending()
    h2 = {r["component"]: r for r in adw.health().collect()}
    assert h2["transformer"]["status"] == "OK"


def test_update_context_sensitivity_override(spark, warehouse_dir, sf_dir):
    adw = make_autodw(spark, warehouse_dir, sf_dir)
    adw.source_include("main", "customer")
    # stub would mark c_name sensitive; context says it is not,
    # and forces c_mktsegment sensitive instead
    adw.update_context("main.customer.c_name", {"sensitive": False})
    adw.update_context("main.customer.c_mktsegment", '{"sensitive": true}')
    adw.classify_pending()
    tr = adw.wh.read("auto_dw.transformer_responses")
    so = adw.wh.read("auto_dw.source_objects")
    j = tr.join(so, tr["fk_source_objects"] == so["pk_source_objects"])
    cats = {r["column_name"]: r["category"] for r in j.collect()}
    assert cats["c_name"] == "Descriptor"
    assert cats["c_mktsegment"] == "Descriptor - Sensitive"
    assert adw.wh.read("auto_dw.context").count() == 2


def test_update_context_description_feeds_prompts(spark, warehouse_dir, sf_dir):
    adw = make_autodw(spark, warehouse_dir, sf_dir)
    adw.update_context("main.customer.c_acctbal", {"description": "account balance"})
    adw.source_include("main", "customer")
    so = adw.wh.read("auto_dw.source_objects")
    row = so.filter(F.col("column_name") == "c_acctbal").collect()[0]
    assert row["column_description"] == "account balance"


def test_set_config_live_settings(spark, warehouse_dir, sf_dir):
    """GUC-surface parity (guc.rs:33-126): the seven pg_auto_dw.*
    settings are live -- confidence re-gates status, model renames the
    recorded transformer, server settings rebuild the transport, and
    bad names/values are rejected."""
    import pytest

    from pg_auto_dw_spark.classify.client import OllamaTransport

    adw = make_autodw(spark, warehouse_dir, sf_dir)
    cfg = adw.show_config()
    assert set(cfg) == set(adw._CONFIG_KEYS)
    assert cfg["pg_auto_dw.accepted_transformer_confidence_level"] == "0.8"

    # live confidence threshold: with the bar above the stub's scores,
    # nothing reaches Ready to Deploy
    adw.set_config("pg_auto_dw.accepted_transformer_confidence_level", "0.99")
    adw.source_include("main", "customer")
    adw.classify_pending()
    ready = adw.source_column().filter(F.col("status") == "Ready to Deploy").count()
    assert ready == 0
    adw.set_config("pg_auto_dw.accepted_transformer_confidence_level", "0.8")
    assert adw.source_column().filter(F.col("status") == "Ready to Deploy").count() > 0

    # live model + transport rebuild
    adw.set_config("pg_auto_dw.model", "mistral-large")
    assert adw.model_name == "mistral-large"
    adw.set_config("pg_auto_dw.transformer_server_type", "ollama")
    assert isinstance(adw.classifier.transport, OllamaTransport)
    assert adw.classifier.transport.model == "mistral-large"
    adw.set_config("pg_auto_dw.transformer_server_type", "stub")
    adw.set_config("pg_auto_dw.dw_schema", "dw2")
    assert adw.dw_schema == "dw2"
    assert adw.show_config("pg_auto_dw.dw_schema") == "dw2"

    with pytest.raises(ValueError, match="unknown setting"):
        adw.set_config("pg_auto_dw.nope", "x")
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        adw.set_config("pg_auto_dw.accepted_transformer_confidence_level", "1.5")
