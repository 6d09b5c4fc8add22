"""Eval-harness scoring: normalized exact match and multiset token F1
per (example, prediction, reference) row, plus the macro report -- the
SQuAD-convention metrics (Rajpurkar et al. 2016, arXiv:1606.05250) an
LLM eval loop aggregates over generations.

All built-ins: normalization is one regex chain, token F1 is the
multiset intersection computed by explode -> per-(example, token)
LEAST(count_pred, count_ref) -> sum -- exact integer counts until the
final ratio, so the per-example numbers are engine-portable (r12
oracle candidate on a fixed-point emit). One shuffle per side for the
token counts + one example-key join; every frame is bounded by token
counts of the PREDICTIONS, never a corpus.

Normalization (the SQuAD rule, minus the English articles step by
default -- pass ``drop_articles=True`` for the verbatim convention):
lowercase, strip punctuation to spaces, collapse whitespace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(col, drop_articles: bool):
    # NULL coalesces to '' so a missing generation scores 0 against a
    # non-empty reference (the SQuAD convention) instead of propagating
    # NULL through EM/f1 -- which eval_summary's avg would then SKIP,
    # letting a model that emits no text score perfectly (r10 ADVICE)
    c = F.lower(F.coalesce(col, F.lit("")))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    if drop_articles:
        c = F.regexp_replace(c, r"\b(a|an|the)\b", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _token_counts(df: DataFrame, id_col: str, text_col: str, out: str):
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("__w"),
    ).filter(F.col("__w") != "")
    return toks.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias(out))


def eval_scores(
    rows: DataFrame,
    id_col: str = "example_id",
    pred_col: str = "prediction",
    ref_col: str = "reference",
    drop_articles: bool = False,
) -> DataFrame:
    """Per-example (example_id, exact_match, n_pred_tokens,
    n_ref_tokens, n_common_tokens, f1): exact_match on the normalized
    strings; f1 = 2 * common / (pred + ref) over token MULTISETS
    (repeated tokens count with multiplicity -- array_intersect's set
    semantics would overscore repetitive generations, which is exactly
    the failure mode an eval should catch). Empty-vs-empty scores
    f1 = 1.0 and EM true; empty-vs-nonempty scores 0. A NULL
    prediction scores exactly like an empty one (0 against any
    non-empty reference) and is flagged via ``pred_missing`` so the
    summary can surface how many generations were missing."""
    base = rows.select(
        F.col(id_col).alias("example_id"),
        F.col(pred_col).isNull().alias("pred_missing"),
        _normalize(F.col(pred_col), drop_articles).alias("__p"),
        _normalize(F.col(ref_col), drop_articles).alias("__r"),
    )
    pc = _token_counts(base, "example_id", "__p", "np")
    rc = _token_counts(base, "example_id", "__r", "nr")
    common = (
        pc.join(rc, ["example_id", "__w"])
        .groupBy("example_id")
        .agg(F.sum(F.least("np", "nr")).alias("n_common_tokens"))
    )
    totals = base.select(
        "example_id",
        "pred_missing",
        (F.col("__p") == F.col("__r")).alias("exact_match"),
        F.when(F.col("__p") == "", F.lit(0))
        .otherwise(F.size(F.split("__p", " ")))
        .cast("bigint")
        .alias("n_pred_tokens"),
        F.when(F.col("__r") == "", F.lit(0))
        .otherwise(F.size(F.split("__r", " ")))
        .cast("bigint")
        .alias("n_ref_tokens"),
    )
    joined = totals.join(common, "example_id", "left").select(
        "example_id",
        "exact_match",
        "pred_missing",
        "n_pred_tokens",
        "n_ref_tokens",
        F.coalesce("n_common_tokens", F.lit(0)).cast("bigint").alias(
            "n_common_tokens"
        ),
    )
    both_empty = (F.col("n_pred_tokens") == 0) & (F.col("n_ref_tokens") == 0)
    f1 = F.when(both_empty, F.lit(1.0)).otherwise(
        2.0
        * F.col("n_common_tokens")
        / (F.col("n_pred_tokens") + F.col("n_ref_tokens"))
    )
    return joined.withColumn("f1", f1)


def eval_summary(scores: DataFrame) -> DataFrame:
    """One-row macro report over ``eval_scores`` output:
    (n_examples, n_null_predictions, em_pct_e4, macro_f1_e4) --
    basis-point BIGINTs, the leaderboard row. ``n_null_predictions``
    surfaces missing generations (they score 0 against any non-empty
    reference, never skip).

    Edge (documented convention, ADVICE r11): a NULL prediction
    against a NULL/EMPTY reference normalizes to empty-vs-empty and
    scores EM true / f1 = 1.0 while still counting in
    ``n_null_predictions`` -- on an empty-reference example, emitting
    nothing IS the right answer under the SQuAD-style convention, so
    the macro averages keep it. Audit ``pred_missing`` rows directly
    when a benchmark treats missing generations as failures outright."""
    return scores.agg(
        F.count(F.lit(1)).alias("n_examples"),
        F.coalesce(
            F.sum(F.col("pred_missing").cast("bigint")), F.lit(0)
        ).alias("n_null_predictions"),
        (F.avg(F.col("exact_match").cast("double")) * 10000)
        .cast("bigint")
        .alias("em_pct_e4"),
        (F.avg("f1") * 10000).cast("bigint").alias("macro_f1_e4"),
    )
