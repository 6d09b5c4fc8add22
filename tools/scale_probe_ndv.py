"""10x scale probe for the incremental NDV sketch ledger: the batch
sketch pass must track rows (one melt scan + col-grain agg); the merge
term is O(n_cols) binary rows, flat in corpus size.

Usage: python tools/scale_probe_ndv.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from pg_auto_dw_spark.functions.sketch import (
        ndv_estimates,
        ndv_sketch_rows,
        update_ndv_sketches,
    )
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark("scale-probe-ndv")

    def batch(n):
        return spark.range(n).select(
            (F.col("id") % 100_003).alias("user_id"),
            (F.col("id") % 17).alias("event_type"),
            F.concat(F.lit("s"), (F.col("id") % 1_000_033).cast("string")).alias(
                "session"
            ),
        ).localCheckpoint(eager=True)

    cols = ["user_id", "event_type", "session"]
    print(f"{'rows':>10}{'sketch_med':>11}{'merge_med':>10}{'ndv_session':>12}")
    for n in (1_000_000, 10_000_000):
        df = batch(n)
        sk_runs = []
        for _ in range(3):
            t0 = time.time()
            ndv_sketch_rows(df, cols).collect()
            sk_runs.append(time.time() - t0)
        root = tempfile.mkdtemp(prefix="ndv_probe_")
        wh = Warehouse(spark, root)
        update_ndv_sketches(wh, "prof.ndv", df, cols)  # seed the ledger
        mg_runs = []
        for _ in range(3):
            t0 = time.time()
            update_ndv_sketches(wh, "prof.ndv", batch(100_000), cols)
            mg_runs.append(time.time() - t0)
        est = {
            r["col_name"]: r["n_distinct"]
            for r in ndv_estimates(wh.read("prof.ndv")).collect()
        }
        print(
            f"{n:>10}{sorted(sk_runs)[1]:>10.2f}s{sorted(mg_runs)[1]:>9.2f}s"
            f"{est['session']:>12}"
        )
        df.unpersist()


if __name__ == "__main__":
    main()
