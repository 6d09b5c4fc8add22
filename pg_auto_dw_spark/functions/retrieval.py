"""Retrieval-training data mining: the operators that turn a corpus +
an ANN index into TRAINING PAIRS for embedding models -- corpus-scale
query search, hard-negative mining (the contrastive-learning staple),
and margin-based bitext mining (Artetxe & Schwenk 2019,
arXiv:1811.01136).

Reference analog: none (pg_auto_dw's surface stops at warehouse
automation); cited as additive LLM-pipeline surface, built entirely on
the similarity module's exact-int quantized kernels.

Scale shapes:
- ``ivf_search_frame`` is the DISTRIBUTED twin of
  ``similarity.ivf_search_index``: that one takes driver-resident
  request waves (request-sized by contract); this one takes a
  corpus-scale query DataFrame -- millions of training queries --
  probing cells through the same Arrow codebook kernel
  (``_assign_against`` precedent: the codebook is bounded at O(sqrt n)
  and ships in the closure; queries NEVER cross-join centroids) and
  re-using the cell-cogrouped top-k kernel. One shuffle of the
  exploded (query x n_probes) rows + the assignment's cell shuffle.
- ``mine_hard_negatives`` / ``margin_score_pairs`` are joins over
  top-k frames: every side is bounded by k x n_queries, orders smaller
  than the corpus the search scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ivf_search_frame(
    wh,
    name: str,
    queries: DataFrame,
    k: int = 5,
    n_probes: int = 1,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """k-NN for a corpus-scale QUERY FRAME against a persisted IVF
    index: (query_id, neighbor_id, cosine), exact within the probed
    cells. Query ids live in the caller's id space (a corpus vector
    with the same id is a legitimate neighbor).

    Per query, the top ``n_probes`` cells are picked by an Arrow
    kernel with the collected codebook in its closure (one int64
    matmul per batch -- no query/centroid pair rows materialize), the
    queries explode to (cell, query) and cogroup against the
    assignment table's cells through the shared exact-int top-k
    kernel. NaN cells (zero-norm centroid or query) rank last, the
    ``ivf_search_index`` rule."""
    import numpy as np

    from .similarity import (
        _PAIR_TOPK_SCHEMA,
        _cogroup_topk_kernel,
        _global_topk,
        with_quantized,
    )

    rows = (
        wh.read(f"{name}.codebook")
        .select("cent_id", "cv", "cn")
        .orderBy("cent_id")
        .collect()
    )
    if not rows:
        raise ValueError(f"index {name} has an empty codebook")
    cent_ids = np.array([r["cent_id"] for r in rows], dtype=np.int64)
    cents = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in rows])
    cent_den = np.sqrt(
        np.array([r["cn"] for r in rows], dtype=np.int64).astype(np.float64)
    )
    p = max(1, min(n_probes, len(rows)))

    def probe_kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            qn = pdf["qn"].to_numpy().astype(np.int64)
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = (mat @ cents.T).astype(np.float64) / (
                    np.sqrt(qn.astype(np.float64))[:, None] * cent_den[None, :]
                )
            cos = np.nan_to_num(cos, nan=-np.inf)
            top = np.argsort(-cos, axis=1, kind="stable")[:, :p]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "qv": pdf["qv"],
                    "qn": pdf["qn"],
                    "cells": [
                        [int(c) for c in cent_ids[t]] for t in top
                    ],
                }
            )

    q = with_quantized(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("embedding"),
        ),
        "embedding",
    ).select(
        "query_id", F.col("qvec").alias("qv"), F.col("qnorm").alias("qn")
    )
    probed = q.mapInPandas(
        probe_kernel,
        "query_id bigint, qv array<bigint>, qn bigint, cells array<bigint>",
    ).select(F.explode("cells").alias("cell_q"), "query_id", "qv", "qn")
    db = wh.read(f"{name}.assignment").select(
        F.col("cell").alias("cell_d"),
        F.col(id_col).alias("neighbor_id"),
        "qvec",
        "qnorm",
    )
    # Explicit-width repartition on BOTH cogroup inputs (r16, guide
    # section 2.5/2.2): the cell exchange is tiny in BYTES (a few
    # hundred qvec rows per cell) but enormous in CPU (the kernel runs
    # an |queries| x |cell| matmul per cell), and AQE's byte-based
    # coalescing collapsed it to ONE task -- measured 1.6s of a 3.4s
    # row at sf0.1 and ~16s single-task at 10x volume, flat 8-vs-32-core
    # ratio. An explicit numPartitions marks the exchange user-specified
    # (AQE leaves it alone); defaultParallelism scales with the cluster.
    par = queries.sparkSession.sparkContext.defaultParallelism
    sim = (
        probed.repartition(par, "cell_q")
        .groupBy("cell_q")
        .cogroup(db.repartition(par, "cell_d").groupBy("cell_d"))
        .applyInPandas(
            lambda qq, dd: _cogroup_topk_kernel(k, strike_self=False)(qq, dd),
            _PAIR_TOPK_SCHEMA,
        )
    )
    return _global_topk(sim, k)


def mine_hard_negatives(
    hits: DataFrame,
    positives: DataFrame,
    query_id_col: str = "query_id",
    positive_id_col: str = "positive_id",
    margin: float | None = 0.95,
    max_negatives: int | None = None,
) -> DataFrame:
    """Hard negatives for contrastive training from a top-k hits frame
    (``ivf_search_frame`` / ``ivf_search_index`` output) and the known
    (query, positive) pairs: the neighbors that are CLOSE but wrong --
    the examples a bi-encoder actually learns from.

    - known positives are removed (anti-join on (query, neighbor));
    - ``margin`` (multiplicative, the sentence-transformers
      convention): a negative scoring >= margin * the query's best
      known-positive score is DROPPED as a probable unlabeled positive
      (false-negative guard). Queries whose positive never made the
      top-k have no reference score and keep all their negatives --
      mining depth (k) should exceed the positive's expected rank; a
      reference score <= 0 disables the guard for that query (the
      convention assumes positive scores; multiplying a non-positive
      one inverts the inequality and would drop the hardest negatives);
    - ``max_negatives`` keeps the hardest n per query (rank by cosine
      desc, id asc -- deterministic).

    Output: (query_id, negative_id, cosine, neg_rank). Every input is
    k x n_queries-bounded; joins hash on the query key."""
    pos_pairs = positives.select(
        F.col(query_id_col).alias("query_id"),
        F.col(positive_id_col).alias("neighbor_id"),
    )
    negs = hits.join(pos_pairs, ["query_id", "neighbor_id"], "left_anti")
    if margin is not None:
        pos_scores = (
            hits.join(pos_pairs, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.max("cosine").alias("__pos_cos"))
        )
        # the multiplicative margin assumes a POSITIVE reference score
        # (the sentence-transformers convention): with __pos_cos <= 0,
        # margin * __pos_cos sits BELOW the positive score, so the
        # filter would drop the hardest (highest-cosine) negatives
        # instead of probable unlabeled positives -- keep everything
        # in that regime (r10 ADVICE)
        negs = negs.join(pos_scores, "query_id", "left").filter(
            F.col("__pos_cos").isNull()
            | (F.col("__pos_cos") <= 0)
            | (F.col("cosine") < F.lit(margin) * F.col("__pos_cos"))
        ).drop("__pos_cos")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    out = negs.withColumn("neg_rank", F.row_number().over(w))
    if max_negatives is not None:
        out = out.filter(F.col("neg_rank") <= max_negatives)
    return out.select(
        "query_id",
        F.col("neighbor_id").alias("negative_id"),
        "cosine",
        "neg_rank",
    )


def margin_score_pairs(
    fwd: DataFrame,
    bwd: DataFrame,
    k: int | None = None,
    threshold: float = 1.0,
    mutual: bool = True,
) -> DataFrame:
    """Margin-scored candidate pairs (Artetxe & Schwenk 2019, the
    bitext-mining criterion): for a forward top-k frame (x -> y) and a
    backward one (y -> x), score each forward pair by

        margin(x, y) = 2 * cos(x, y) / (avgk_fwd(x) + avgk_bwd(y))

    -- cosine RATIO to the average of both neighborhoods, which
    suppresses hubs (vectors close to everything) that absolute-
    threshold mining admits. Keep margin >= threshold;
    ``mutual=True`` additionally requires y's best backward neighbor
    to be x (the mutual-best rule used for high-precision mining).

    Both inputs are (query_id, neighbor_id, cosine) top-k frames --
    k x n-bounded, so every join here is over mined candidates, never
    the corpus. ``k`` trims deeper frames to the top-k before
    averaging (pass None to use the frames as given)."""
    def trim(df):
        if k is None:
            return df
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    f, b = trim(fwd), trim(bwd)
    favg = f.groupBy("query_id").agg(F.avg("cosine").alias("__favg"))
    bavg = b.groupBy("query_id").agg(F.avg("cosine").alias("__bavg"))
    cand = (
        f.select(
            F.col("query_id").alias("src_id"),
            F.col("neighbor_id").alias("tgt_id"),
            "cosine",
        )
        .join(favg.select(F.col("query_id").alias("src_id"), "__favg"), "src_id")
        .join(bavg.select(F.col("query_id").alias("tgt_id"), "__bavg"), "tgt_id")
        .withColumn(
            "margin",
            F.lit(2.0) * F.col("cosine") / (F.col("__favg") + F.col("__bavg")),
        )
        .drop("__favg", "__bavg")
        .filter(F.col("margin") >= threshold)
    )
    if mutual:
        wb = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        best_back = (
            b.withColumn("__rn", F.row_number().over(wb))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("query_id").alias("tgt_id"),
                F.col("neighbor_id").alias("src_id"),
            )
        )
        cand = cand.join(best_back, ["src_id", "tgt_id"], "left_semi")
    return cand.select("src_id", "tgt_id", "cosine", "margin")
