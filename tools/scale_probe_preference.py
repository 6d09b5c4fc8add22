"""10x scale probe for preference-pair assembly (functions/
preference.py): per-round protocol -- wall clock must track rows
(one prompt-key shuffle + per-prompt windows), and the all-pairs cap
must keep output linear in prompts even when responses/prompt grow.

Usage: python tools/scale_probe_preference.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def ratings(spark, n_prompts: int, per_prompt: int):
    return spark.range(n_prompts * per_prompt).select(
        (F.col("id") % n_prompts).alias("prompt_id"),
        F.col("id").alias("response_id"),
        # deterministic pseudo-scores with plenty of ties
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 100.0).alias("score"),
    ).localCheckpoint(eager=True)


def main() -> None:
    from pg_auto_dw_spark.functions.preference import preference_pairs
    from pg_auto_dw_spark.session import get_spark

    spark = get_spark("scale-probe-preference")
    print(f"{'rows':>10}{'shape':>16}{'strategy':>12}{'median':>9}{'pairs':>10}")
    for n_prompts, per in ((50_000, 8), (500_000, 8), (50_000, 80)):
        df = ratings(spark, n_prompts, per)
        n = n_prompts * per
        for strategy in ("best_worst", "all_pairs"):
            runs, pairs = [], None
            for _ in range(3):
                t0 = time.time()
                pairs = preference_pairs(
                    df, strategy=strategy, max_pairs_per_prompt=64
                ).count()
                runs.append(time.time() - t0)
            print(
                f"{n:>10}{f'{n_prompts}x{per}':>16}{strategy:>12}"
                f"{sorted(runs)[1]:>8.2f}s{pairs:>10}"
            )
        df.unpersist()


if __name__ == "__main__":
    main()
