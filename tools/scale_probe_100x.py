"""100x scale probe for the flagship load/analytics paths.

Derives a 100x dataset from sf0.1 (lineitem/orders/customer replicated
with shifted keys -- 60M lineitem rows), then measures:

- q1-style pricing summary   (scan + partial agg; the pure-scan ceiling)
- composite hub load         (sha2 keys + anti-join + append; the DV
                              ingest path, including the parquet write)
- partitioned SCD2 merge     (bucket-pruned read-merge-write at 100x
                              dimension size)

Prints one table; add the numbers to SCALE.md. Reproducible: the
derived dataset is rebuilt only when absent.

Usage: python tools/scale_probe_100x.py [ops...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

FACTOR = 100


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark("scale-probe-100x")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out_dir = os.path.join(base, f"scale_probe_{FACTOR}x")
    li_path = os.path.join(out_dir, "lineitem")
    cu_path = os.path.join(out_dir, "customer")
    reps = spark.range(FACTOR).select(F.col("id").alias("rep"))
    if not os.path.isdir(li_path):
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.crossJoin(reps)
            .select(
                (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
                (F.col("l_partkey") + F.col("rep") * 10_000_000).alias("l_partkey"),
                (F.col("l_suppkey") + F.col("rep") * 1_000_000).alias("l_suppkey"),
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            )
            .repartition(128)
            .write.mode("overwrite")
            .parquet(li_path)
        )
    if not os.path.isdir(cu_path):
        cu = load_table(spark, sf_dir, "customer")
        (
            cu.crossJoin(reps)
            .select(
                (F.col("c_custkey") + F.col("rep") * 10_000_000).alias("c_custkey"),
                "c_name",
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(cu_path)
        )

    def timed(label, fn):
        t0 = time.time()
        n = fn()
        print(f"{label:28s} {time.time() - t0:8.1f}s  rows={n}")

    names = sys.argv[1:] or ["q1", "hub_load", "scd2_merge"]

    if "q1" in names:
        li = spark.read.parquet(li_path)
        dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
        timed(
            f"q1_pricing_summary {FACTOR}x",
            lambda: li.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(dec("l_quantity")).alias("sq"),
                F.sum(dec("l_extendedprice")).alias("sp"),
                F.count(F.lit(1)).alias("n"),
            )
            .count(),
        )

    if "hub_load" in names:
        import tempfile

        from pg_auto_dw_spark.build.ddl import hub_schema
        from pg_auto_dw_spark.build.loader import load_hub
        from pg_auto_dw_spark.build.spec import business_key_from_spec
        from pg_auto_dw_spark.warehouse import Warehouse

        bk = business_key_from_spec(
            schema_name="main",
            table_name="lineitem",
            bk_name="lineitem",
            key_columns=[("l_orderkey", "bigint"), ("l_linenumber", "int")],
            descriptor_columns=[("l_quantity", "double precision", False)],
        )
        wh = Warehouse(spark, tempfile.mkdtemp(prefix="probe100_", dir="/tmp"))
        wh.create_table("dw.hub_lineitem", hub_schema(bk))
        li = spark.read.parquet(li_path)

        def run():
            import datetime

            load_hub(wh, li, bk, load_ts=datetime.datetime(2024, 6, 1))
            return wh.read("dw.hub_lineitem").count()

        timed(f"hub composite load {FACTOR}x", run)

    if "scd2_merge" in names:
        import datetime
        import tempfile

        from pg_auto_dw_spark.build.scd2_dim import merge_batch
        from pg_auto_dw_spark.warehouse import Warehouse

        cust = (
            spark.read.parquet(cu_path)
            .select(
                "c_custkey",
                "c_name",
                "c_acctbal",
                "c_mktsegment",
                F.pmod(F.col("c_custkey"), F.lit(64)).cast("long").alias("key_bucket"),
            )
        )
        init = cust.select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "c_mktsegment",
            "key_bucket",
            F.lit(datetime.datetime(2024, 1, 1)).cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit("Y").alias("current_flag"),
            F.lit("N").alias("deleted_flag"),
        )
        wh = Warehouse(spark, tempfile.mkdtemp(prefix="probe100s_", dir="/tmp"))
        wh.create_table("dim.customer", init.schema, partition_by=["key_bucket"])
        wh.append("dim.customer", init.repartition("key_bucket"))
        batch = (
            cust.filter(F.col("key_bucket").isin(3, 17))
            .filter(F.col("c_custkey") % 5 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + 100)
        )

        def run():
            stats = merge_batch(
                wh,
                "dim.customer",
                batch,
                key_cols=["c_custkey"],
                tracked_cols=["c_name", "c_acctbal", "c_mktsegment"],
                as_of=datetime.datetime(2024, 6, 1),
            )
            return stats.get("closed_total", 0)

        timed(f"scd2 partitioned merge {FACTOR}x", run)


if __name__ == "__main__":
    main()
