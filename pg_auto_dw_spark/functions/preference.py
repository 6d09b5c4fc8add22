"""Preference-pair assembly: turn a response-grain ratings table into
(chosen, rejected) training pairs for DPO/RLHF reward modeling -- the
third leg of the training-data pipeline next to packing (pretraining)
and ``sft.render_chat`` (instruction tuning).

Everything is built-ins over ONE prompt-key shuffle: per-prompt windows
pick the pairing, an integer/double gap filter drops uninformative
pairs, and the all-pairs strategy is CAPPED per prompt (the hot-bucket
discipline: a prompt with 1000 sampled responses must not emit 500k
pairs). Reference analog: none; additive LLM-pipeline surface (r13
oracle candidate -- windows + joins over exact scores, SQL-replayable).

Scale shape at 100 TB: ratings tables are response-grain (prompts x
samples); every operator here is one shuffle on the prompt key plus
per-prompt window state bounded by the per-prompt sample count, and
the only fan-out (all-pairs) is capped by ``max_pairs_per_prompt``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STRATEGIES = ("best_worst", "best_rest", "all_pairs")


def preference_pairs(
    ratings: DataFrame,
    prompt_col: str = "prompt_id",
    response_col: str = "response_id",
    score_col: str = "score",
    strategy: str = "best_worst",
    min_gap: float = 0.0,
    max_pairs_per_prompt: int = 64,
    max_responses_per_prompt: int = 1024,
) -> DataFrame:
    """(prompt_id, chosen_id, rejected_id, chosen_score,
    rejected_score, score_gap) preference pairs.

    Strategies (all deterministic on any partitioning -- the chosen
    side breaks score ties on ascending response id, the rejected side
    on DESCENDING id, so even a fully-tied prompt yields one stable
    pair rather than an arbitrary or self-colliding one):

    - ``best_worst``: ONE pair per prompt, its top-scored response
      against its bottom-scored (the highest-signal pair; the default
      reward-model recipe).
    - ``best_rest``: the top response against every other STRICTLY
      lower-scored response -- up to n-1 pairs per prompt (best-of-n
      distillation style). Responses tied with the best never emit:
      in a multi-pair strategy a zero-gap pair is pure label noise
      (the 'chosen' label would be an id accident), unlike
      best_worst's single documented tie-marker pair.
    - ``all_pairs``: every STRICTLY ordered pair (chosen score >
      rejected score) with ``score_gap >= min_gap``,
      kept in gap-descending order up to ``max_pairs_per_prompt``. The
      cap bounds the OUTPUT, but the pair join itself still fans out
      O(n^2) rows per prompt before the cap (measured: 80
      responses/prompt = 6.6x the wall of 8/prompt at equal total
      rows, SCALE.md r11) -- so a prompt with more than
      ``max_responses_per_prompt`` responses fails loudly instead of
      silently materializing millions of pre-cap rows; pre-trim wide
      feeds (``best_of_n_filter``-style sampling) before pairing.

    ``min_gap`` applies to every strategy: a pair whose scores are
    closer than the gap carries label noise, not signal -- with
    ``best_worst`` the prompt emits nothing (all its responses tied),
    which is the correct outcome for an unanimously-rated prompt.

    Prompts with a single response never emit (nothing to prefer).
    NULL scores fail loudly: a missing rating is an upstream bug, and
    silently ranking NULL would quietly pick arbitrary winners."""
    if strategy not in _STRATEGIES:
        raise ValueError(f"strategy must be one of {_STRATEGIES}, got {strategy!r}")
    guarded_score = F.when(
        F.col(score_col).isNotNull(), F.col(score_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("preference_pairs: NULL score for prompt "),
                F.col(prompt_col).cast("string"),
                F.lit(" response "),
                F.col(response_col).cast("string"),
            )
        )
    )
    base = ratings.select(
        F.col(prompt_col).alias("prompt_id"),
        F.col(response_col).alias("response_id"),
        guarded_score.alias("score"),
    )
    w_best = Window.partitionBy("prompt_id").orderBy(
        F.col("score").desc(), F.col("response_id")
    )
    ranked = base.withColumn("__rk", F.row_number().over(w_best))
    best = ranked.filter(F.col("__rk") == 1).select(
        "prompt_id",
        F.col("response_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    if strategy == "best_worst":
        # ties break DESC on the rejected side (vs ASC for chosen) so a
        # fully-tied prompt still yields a distinct, deterministic
        # (lowest-id chosen, highest-id rejected) pair at min_gap=0
        # instead of self-colliding; min_gap > 0 drops it as intended
        w_worst = Window.partitionBy("prompt_id").orderBy(
            F.col("score").asc(), F.col("response_id").desc()
        )
        worst = base.withColumn("__rk", F.row_number().over(w_worst)).filter(
            F.col("__rk") == 1
        ).select(
            "prompt_id",
            F.col("response_id").alias("rejected_id"),
            F.col("score").alias("rejected_score"),
        )
        pairs = best.join(worst, "prompt_id")
    elif strategy == "best_rest":
        rest = ranked.filter(F.col("__rk") > 1).select(
            "prompt_id",
            F.col("response_id").alias("rejected_id"),
            F.col("score").alias("rejected_score"),
        )
        # ties with the best are dropped: zero-gap 'preferences' are
        # label noise in a multi-pair strategy (ADVICE r11)
        pairs = best.join(rest, "prompt_id").filter(
            F.col("chosen_score") > F.col("rejected_score")
        )
    else:  # all_pairs
        # loud quadratic guard: one prompt-grain count join costs far
        # less than the n^2-per-prompt fan-out it prevents. The guard
        # rides the SCORE column (which survives to the output) -- a
        # standalone guard column would be column-pruned by Catalyst
        # and never evaluate.
        counts = base.groupBy("prompt_id").agg(F.count(F.lit(1)).alias("__n"))
        guarded = base.join(counts, "prompt_id").withColumn(
            "score",
            F.when(
                F.col("__n") <= max_responses_per_prompt, F.col("score")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("preference_pairs: prompt "),
                        F.col("prompt_id").cast("string"),
                        F.lit(" has "),
                        F.col("__n").cast("string"),
                        F.lit(
                            f" responses > max_responses_per_prompt="
                            f"{max_responses_per_prompt}; pre-trim wide"
                            f" feeds before all-pairs"
                        ),
                    )
                )
            ),
        ).drop("__n")
        hi = guarded.select(
            "prompt_id",
            F.col("response_id").alias("chosen_id"),
            F.col("score").alias("chosen_score"),
        )
        lo = guarded.select(
            "prompt_id",
            F.col("response_id").alias("rejected_id"),
            F.col("score").alias("rejected_score"),
        )
        # strictly ordered only: a tied pair would label the lower id
        # 'chosen' by accident, injecting noise into DPO sets
        # (ADVICE r11) -- best_worst is the one strategy that emits a
        # documented tie-marker pair
        pairs = hi.join(lo, "prompt_id").filter(
            F.col("chosen_score") > F.col("rejected_score")
        )
    pairs = pairs.filter(F.col("chosen_id") != F.col("rejected_id")).withColumn(
        "score_gap", F.col("chosen_score") - F.col("rejected_score")
    ).filter(F.col("score_gap") >= min_gap)
    if strategy == "all_pairs":
        w_cap = Window.partitionBy("prompt_id").orderBy(
            F.col("score_gap").desc(), F.col("chosen_id"), F.col("rejected_id")
        )
        pairs = (
            pairs.withColumn("__pn", F.row_number().over(w_cap))
            .filter(F.col("__pn") <= max_pairs_per_prompt)
            .drop("__pn")
        )
    return pairs.select(
        "prompt_id", "chosen_id", "rejected_id",
        "chosen_score", "rejected_score", "score_gap",
    )


def best_of_n_filter(
    samples: DataFrame,
    prompt_col: str = "prompt_id",
    score_col: str = "score",
) -> DataFrame:
    """Rejection sampling / best-of-n distillation: keep exactly the
    top-scored row per prompt. Deterministic on any partitioning:
    score ties break on the remaining columns in ascending column
    order, so equal-scored rows always resolve the same way. One
    window, one prompt-key shuffle; the SFT composition is
    best_of_n_filter -> render_chat."""
    other = [c for c in samples.columns if c not in (prompt_col, score_col)]
    w = Window.partitionBy(prompt_col).orderBy(
        F.col(score_col).desc(), *[F.col(c) for c in other]
    )
    return (
        samples.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def preference_pair_audit(
    pairs: DataFrame,
    responses: DataFrame,
    response_id_col: str = "response_id",
    text_col: str = "response",
) -> DataFrame:
    """The data-bug sweep a preference set needs before training:
    per-prompt (n_pairs, total_gap, n_degenerate, n_missing_text)
    where a DEGENERATE pair's chosen and rejected texts are
    byte-identical (same sha2 digest) -- the classic duplicated-sample
    failure that teaches a reward model that identical text is both
    better and worse than itself -- and ``n_missing_text`` counts
    pairs referencing a response id absent from ``responses`` (LEFT
    joins: a dangling reference is itself a data bug the audit must
    SURFACE, not silently drop from its counts).

    Two id-key left joins against the response digests
    (response-grain, hashed once) + one prompt-key aggregate."""
    digests = responses.select(
        F.col(response_id_col).alias("__rid"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("__dg"),
    )
    joined = (
        pairs.join(
            digests.select(
                F.col("__rid").alias("chosen_id"), F.col("__dg").alias("__dg_c")
            ),
            "chosen_id",
            "left",
        )
        .join(
            digests.select(
                F.col("__rid").alias("rejected_id"), F.col("__dg").alias("__dg_r")
            ),
            "rejected_id",
            "left",
        )
    )
    return joined.groupBy("prompt_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("score_gap").alias("total_gap"),
        F.count(F.when(F.col("__dg_c") == F.col("__dg_r"), F.lit(1))).alias(
            "n_degenerate"
        ),
        F.count(
            F.when(
                F.col("__dg_c").isNull() | F.col("__dg_r").isNull(), F.lit(1)
            )
        ).alias("n_missing_text"),
    )


def render_preference_pairs(
    pairs: DataFrame,
    prompts: DataFrame,
    responses: DataFrame,
    prompt_text_col: str = "prompt",
    response_id_col: str = "response_id",
    text_col: str = "response",
) -> DataFrame:
    """DPO-ready training rows: each (chosen, rejected) pair rendered
    under the SAME pinned chat template as ``sft.render_chat`` --
    '<|user|>\\n{prompt}\\n<|assistant|>\\n{response}\\n' -- so
    preference data and SFT data land in one rendering convention and
    a policy trained on one reads the other. Output: (prompt_id,
    chosen_id, rejected_id, score_gap, chosen_text, rejected_text).

    ``prompts`` is prompt-grain (prompt_id, prompt text); missing
    prompt or response text FAILS LOUDLY -- a silently-empty chosen
    text would train the policy to prefer emptiness (same posture as
    the NULL-role guard in render_chat). Three id-key hash joins, all
    pair-bounded."""
    from .sft import _piece

    def _require(col, what):
        return F.when(col.isNotNull(), col).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"render_preference_pairs: missing {what} for pair ("),
                    F.col("prompt_id").cast("string"),
                    F.lit(", "),
                    F.col("chosen_id").cast("string"),
                    F.lit(", "),
                    F.col("rejected_id").cast("string"),
                    F.lit(")"),
                )
            )
        )

    p = prompts.select(
        F.col("prompt_id"), F.col(prompt_text_col).alias("__prompt")
    )
    r = responses.select(
        F.col(response_id_col).alias("__rid"), F.col(text_col).alias("__resp")
    )
    joined = (
        pairs.join(p, "prompt_id", "left")
        .join(
            r.select(F.col("__rid").alias("chosen_id"),
                     F.col("__resp").alias("__chosen")),
            "chosen_id", "left",
        )
        .join(
            r.select(F.col("__rid").alias("rejected_id"),
                     F.col("__resp").alias("__rejected")),
            "rejected_id", "left",
        )
    )
    user = _piece(F.lit("user"), _require(F.col("__prompt"), "prompt text"))
    chosen = F.concat(
        user, _piece(F.lit("assistant"), _require(F.col("__chosen"), "chosen text"))
    )
    rejected = F.concat(
        user,
        _piece(F.lit("assistant"), _require(F.col("__rejected"), "rejected text")),
    )
    return joined.select(
        "prompt_id", "chosen_id", "rejected_id", "score_gap",
        chosen.alias("chosen_text"), rejected.alias("rejected_text"),
    )
