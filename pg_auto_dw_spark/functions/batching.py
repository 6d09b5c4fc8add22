"""Padding-aware inference batching: group documents into batches whose
padded token cost fits a budget -- the serving/eval twin of
``corpus.pack_sequences`` (training packs documents end-to-end;
inference pads every row in a batch to the batch maximum, so batches of
SIMILAR lengths waste the least compute).

Design: documents land in power-of-two length BANDS (band upper bound =
next power of two >= n_tokens), and each band takes a fixed
``rows_per_batch = max(1, budget div band_upper)`` -- every batch's
padded cost ``rows * band_upper`` is then <= budget by construction,
and padding waste is bounded by the band width (< 2x) instead of by the
corpus length spread. Assignment is ``row_number() div rows_per_batch``
over a deterministic hash order.

Scale shape: ONE shuffle (the per-band window). A band holding most of
the corpus would otherwise sort in one task, so bands are SALTED into
``n_salts`` independent sub-partitions -- batches never cross salts,
each salt's batches independently satisfy the budget, and the window
state per task drops to band/n_salts rows. Batch ids are globally
unique by construction: (band, salt) packs into the high bits, the
per-salt running batch number into the low 32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LOCAL_BITS = 32  # per-(band, salt) batch counter capacity


def inference_batch_plan(
    docs: DataFrame,
    max_tokens_per_batch: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_salts: int = 32,
    token_counts_df: DataFrame | None = None,
) -> DataFrame:
    """One row per doc: (id, n_tokens, band_tokens, batch_id,
    rows_per_batch). ``band_tokens`` is the padded per-row cost the
    batch pays; ``batch_id`` is a globally-unique BIGINT. Docs longer
    than the budget get a one-row batch each (band_tokens still
    reports their true padded cost -- the caller decides whether to
    truncate or route to a long-context path; this planner never
    silently drops or splits). ``token_counts_df`` supplies exact
    counts (e.g. ``tokenizer.bpe_apply``) keyed by id with an
    ``n_bpe_tokens`` column -- same LEFT-join + loud-failure contract
    as ``pack_sequences``; default is the regex proxy."""
    if max_tokens_per_batch < 1:
        raise ValueError("max_tokens_per_batch must be >= 1")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    t = F.col(text_col)
    if token_counts_df is not None:
        base = docs.select(F.col(id_col)).join(
            token_counts_df.select(id_col, "n_bpe_tokens"), id_col, "left"
        ).select(
            F.col(id_col),
            F.when(
                F.col("n_bpe_tokens").isNotNull(),
                F.col("n_bpe_tokens").cast("long"),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "inference_batch_plan: token_counts_df has no row "
                            f"for {id_col}="
                        ),
                        F.col(id_col).cast("string"),
                    )
                )
            )
            .alias("n_tokens"),
        )
    else:
        # coalesce: a NULL text is a zero-token request, never a NULL
        # that the batch-budget SUM would silently skip (the
        # pack_sequences r15 fix, same proxy)
        base = docs.select(
            F.col(id_col),
            F.coalesce(
                F.size(
                    F.regexp_extract_all(
                        t, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0
                    )
                ).cast("long"),
                F.lit(0),
            ).alias("n_tokens"),
        )
    # band upper bound: next power of two >= max(n_tokens, 1)
    band = F.pow(F.lit(2.0), F.ceil(F.log2(F.greatest(F.col("n_tokens"), F.lit(1))))).cast(
        "long"
    )
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    plan = base.select(
        id_col,
        "n_tokens",
        F.greatest(band, F.lit(1)).alias("band_tokens"),
        (h % n_salts).alias("__salt"),
        h.alias("__order"),
    ).withColumn(
        "rows_per_batch",
        F.greatest(
            F.lit(1), F.expr(f"{max_tokens_per_batch} div band_tokens")
        ).cast("long"),
    )
    w = Window.partitionBy("band_tokens", "__salt").orderBy("__order", id_col)
    plan = plan.withColumn("__rn", (F.row_number().over(w) - 1).cast("long"))
    local = F.expr("__rn div rows_per_batch")  # exact integer division
    band_slot = F.log2("band_tokens").cast("long") * n_salts + F.col("__salt")
    return plan.select(
        id_col,
        "n_tokens",
        "band_tokens",
        "rows_per_batch",
        (band_slot * F.lit(1 << _LOCAL_BITS) + local).alias("batch_id"),
    )


def batch_plan_stats(plan: DataFrame) -> DataFrame:
    """Per-batch audit of a plan: (batch_id, band_tokens, n_rows,
    padded_tokens, real_tokens, waste_pct_e4) -- padded cost =
    n_rows * band_tokens, waste in basis points as BIGINT. Bounded at
    the batch count."""
    return (
        plan.groupBy("batch_id", "band_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tokens").alias("real_tokens"),
        )
        .select(
            "batch_id",
            "band_tokens",
            "n_rows",
            (F.col("n_rows") * F.col("band_tokens")).alias("padded_tokens"),
            "real_tokens",
            F.round(
                (F.col("n_rows") * F.col("band_tokens") - F.col("real_tokens"))
                * 10000
                / (F.col("n_rows") * F.col("band_tokens")),
                0,
            )
            .cast("bigint")
            .alias("waste_pct_e4"),
        )
    )
