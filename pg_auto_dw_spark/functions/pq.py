"""Product quantization (IVF-PQ's compression half) for vector search
at corpus scale.

At 100 TB the ANN working set is not the float vectors -- it is the
PQ codes: a 64-dim float32 vector (256 B) compresses to ``m`` sub-codes
(m bytes at ksub<=256), a 32x reduction that is what lets a
1000-executor cluster keep the whole corpus's candidate representation
in memory while the raw vectors stay on disk for the re-rank tail.
Search is asymmetric distance computation (ADC): the query stays
exact, each sub-code is scored through a per-query lookup table, and
the candidate's score is the sum of ``m`` table entries -- no float
vector is touched until the optional exact re-rank of the shortlist.

Determinism contract (shared with the rest of this module family):
all training and scoring math stays on the module's quantized int64
coordinates -- centroids are exact integer floor-means, LUT entries
are exact int64 sub-dots, an ADC score is an exact int64 sum divided
once in IEEE float64 -- so codes, scores, and rankings are
bit-identical across partitionings, engines, and repeated builds
(float PQ would drift with partial-aggregation order).

Reference parity note: the reference (tembo-io/pg_auto_dw, a pgrx
extension around extension/src/lib.rs) has no vector search; this file
belongs to the driver-mandated beyond-reference pipeline surface,
composing with functions/similarity.py (IVF cells, brute-force rerank,
recall harness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import (
    _PAIR_TOPK_SCHEMA,
    SCALE,
    _global_topk,
    cosine,
    int_dot,
    with_quantized,
)


def _collect_codebook(codebook: DataFrame, m: int, ksub: int, dsub: int):
    """(m, ksub, dsub) int64 centroid tensor + (m, ksub) norm matrix
    from the codebook table; missing (sub, code) cells (dropped empty
    Lloyd cells) get +inf distance via a validity mask."""
    import numpy as np

    cent = np.zeros((m, ksub, dsub), dtype=np.int64)
    valid = np.zeros((m, ksub), dtype=bool)
    for r in codebook.collect():
        cent[r["sub"], r["code"]] = np.asarray(r["cv"], dtype=np.int64)
        valid[r["sub"], r["code"]] = True
    return cent, valid


def _pq_assign_codes(mat, cent, valid, m: int, dsub: int):
    """(n, m) int32 sub-codes for an int64 vector batch: per subspace,
    exact int64 L2 argmin against the centroid tensor (|x|^2 - 2 x.c +
    |c|^2; dropped Lloyd cells masked to +inf; ties -> lowest code via
    first-min). THE single assignment definition -- pq_train's Lloyd
    rounds, pq_encode, and the composed index build all call this, so
    the bit-identical-codes contract cannot diverge between build
    paths (r7 review)."""
    import numpy as np

    codes = np.empty((mat.shape[0], m), dtype=np.int32)
    for s in range(m):
        x = mat[:, s * dsub : (s + 1) * dsub]
        d = (
            (x * x).sum(axis=1)[:, None]
            - 2 * (x @ cent[s].T)
            + (cent[s] * cent[s]).sum(axis=1)[None, :]
        )
        d[:, ~valid[s]] = np.iinfo(np.int64).max
        codes[:, s] = d.argmin(axis=1)
    return codes


def _adc_cosines(lut, cnorm, codes, q_den, m: int):
    """(n_q, n) ADC cosine matrix for a codes batch: exact int64 LUT
    gather-sums for the reconstructed dot and norm, one IEEE float64
    division. Shared by pq_topk and ivf_pq_search_index so the score
    definition has exactly one home."""
    import numpy as np

    dots = np.zeros((lut.shape[0], codes.shape[0]), dtype=np.int64)
    rnorm = np.zeros(codes.shape[0], dtype=np.int64)
    for s in range(m):
        dots += lut[:, s, codes[:, s]]
        rnorm += cnorm[s, codes[:, s]]
    den = q_den[:, None] * np.sqrt(rnorm.astype(np.float64))[None, :]
    return np.where(den > 0, dots.astype(np.float64) / den, -np.inf)


def _exact_rerank(
    adc: DataFrame,
    qside: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine re-rank of an ADC shortlist: pin the shortlist
    (scored once, read by the id collect + the join), push its ids down
    into the corpus re-scan as an IN filter (the raw vectors live on
    disk; ADC decided which few to fetch), score the bounded pair set
    with exact int64 dots, take the global top-k. ``qside`` carries
    (query_id, q_qvec, q_qnorm) however the caller sourced its queries
    (corpus rows or driver-resident vectors)."""
    adc = adc.localCheckpoint()
    cand_ids = [
        r["neighbor_id"] for r in adc.select("neighbor_id").distinct().collect()
    ]
    nside = with_quantized(corpus.filter(F.col(id_col).isin(cand_ids)), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("n_qvec"),
        F.col("qnorm").alias("n_qnorm"),
    )
    exact = (
        adc.select("query_id", "neighbor_id")
        .join(F.broadcast(qside), "query_id")
        .join(nside, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                int_dot(F.col("q_qvec"), F.col("n_qvec")),
                F.col("q_qnorm"),
                F.col("n_qnorm"),
            ).alias("cosine"),
        )
    )
    return _global_topk(exact, k)


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 1,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_modulus: int = 1,
) -> DataFrame:
    """Per-subspace k-means PQ codebook: ``m`` subspaces of
    ``dims/m`` coordinates, ``ksub`` centroids each, trained with
    integer Lloyd iterations.

    Seeds are the ``ksub`` lowest-id vectors' sub-slices (deterministic,
    O(ksub) driver rows). Each Lloyd round is ONE Arrow ``mapInPandas``
    pass over the training set (every vector's m sub-assignments as one
    vectorized L2 argmin against the full centroid tensor, exact int64)
    emitting m partial rows per vector, then ONE map-side-combined
    groupBy (sub, code) with dsub integer SUMs -> floor-mean centroids.
    m * ksub is bounded by construction (128 cells at the defaults), so
    the codebook always collects. Cells that lose all members drop out
    (standard Lloyd). At 100 TB set ``train_modulus`` > 1: Lloyd reads
    only the deterministic id-modulus subsample; only ``pq_encode``
    ever pays a full-corpus pass.

    Output: (sub, code, cv array<bigint>[dsub], cn bigint = ||cv||^2).
    """
    import numpy as np
    import pandas as pd

    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    train = corpus if train_modulus <= 1 else corpus.filter(
        (F.col(id_col) % train_modulus) == 0
    )
    base = (
        with_quantized(train, vec_col)
        .select(F.col(id_col), "qvec")
        .localCheckpoint(eager=False)  # iters passes read one computed scan
    )
    seed_rows = base.orderBy(id_col).limit(ksub).collect()
    if not seed_rows:
        raise ValueError("pq_train: empty training set")
    cent = np.zeros((m, ksub, dsub), dtype=np.int64)
    valid = np.zeros((m, ksub), dtype=bool)
    for c, r in enumerate(seed_rows):
        v = np.asarray(r["qvec"], dtype=np.int64)
        for s in range(m):
            cent[s, c] = v[s * dsub : (s + 1) * dsub]
            valid[s, c] = True

    spark = corpus.sparkSession
    sum_schema = "sub int, code int, " + ", ".join(
        f"v{i} bigint" for i in range(dsub)
    )

    for _ in range(iters):
        cent_b, valid_b = cent, valid

        def assign_partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.stack(pdf["qvec"].to_numpy()).astype(np.int64)
                n = mat.shape[0]
                codes = _pq_assign_codes(mat, cent_b, valid_b, m, dsub)
                yield pd.DataFrame(
                    {
                        "sub": np.repeat(
                            np.arange(m, dtype=np.int32), n
                        ),
                        "code": codes.T.reshape(-1),
                        **{
                            f"v{i}": np.concatenate(
                                [mat[:, s * dsub + i] for s in range(m)]
                            )
                            for i in range(dsub)
                        },
                    }
                )

        sums = (
            base.mapInPandas(assign_partials, sum_schema)
            .groupBy("sub", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(f"v{i}").alias(f"s{i}") for i in range(dsub)],
            )
            .collect()  # <= m * ksub rows by construction
        )
        cent = np.zeros((m, ksub, dsub), dtype=np.int64)
        valid = np.zeros((m, ksub), dtype=bool)
        for r in sums:
            s, c = r["sub"], r["code"]
            valid[s, c] = True
            for i in range(dsub):
                # exact floor-mean on integers (reproducible; no float)
                cent[s, c, i] = r[f"s{i}"] // r["n"]

    rows = [
        (s, c, [int(x) for x in cent[s, c]], int((cent[s, c] ** 2).sum()))
        for s in range(m)
        for c in range(ksub)
        if valid[s, c]
    ]
    return spark.createDataFrame(
        rows, "sub int, code int, cv array<bigint>, cn bigint"
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>[m], qnorm) -- each vector's per-subspace
    nearest-centroid codes (exact int64 L2 argmin, ties -> lowest
    code) plus its TRUE quantized norm (kept for diagnostics; ADC uses
    the reconstructed norm so the scorer never needs the vector).

    One Arrow pass, codebook tensor in the kernel closure (bounded at
    m * ksub * dsub int64s); the corpus never shuffles. This is the
    index-build output a warehouse deployment writes to a codes table
    (m bytes/vector at ksub<=256) and probes many times."""
    import numpy as np
    import pandas as pd

    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    cent, valid = _collect_codebook(codebook, m, ksub, dsub)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["qvec"].to_numpy()).astype(np.int64)
            codes = _pq_assign_codes(mat, cent, valid, m, dsub)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "codes": list(codes),
                    "qnorm": pdf["qnorm"].to_numpy(),
                }
            )

    return (
        with_quantized(corpus, vec_col)
        .select(F.col(id_col).alias("id"), "qvec", "qnorm")
        .mapInPandas(kernel, "id bigint, codes array<int>, qnorm bigint")
    )


def pq_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    iters: int = 1,
    rerank: int = 0,
    codebook: DataFrame | None = None,
    encoded: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: exact queries against PQ codes, optional exact
    re-rank of a shortlist.

    Per query the driver precomputes the (m, ksub) int64 LUT of
    sub-dots against the codebook (exact); the kernel scores each
    codes batch as a LUT gather-sum -- sum_s LUT[s, code_s] is the
    exact dot of the query with the RECONSTRUCTED vector, and the
    denominator uses the reconstructed norm sum_s ||c_{s,code_s}||^2,
    so the ADC cosine is a deterministic function of the codes. One
    scan of the codes table (m ints/vector -- the compressed
    representation IS the scan), zero shuffles of corpus data, then
    the usual O(partitions x queries x k') survivor window.

    ``rerank`` > 0 re-scores the top-``rerank`` ADC shortlist with
    exact int64 dots on the true vectors (one id-pushdown join against
    the corpus; the shortlist is queries x rerank rows, always tiny)
    and returns the exact-cosine top-k -- the standard IVF-PQ+rerank
    serving shape. With ``rerank`` = 0 the returned cosine is the ADC
    approximation.

    Pass ``codebook``/``encoded`` to reuse a built index (the
    build-once/probe-many contract); omitting them trains and encodes
    in-call for self-contained use."""
    import numpy as np
    import pandas as pd

    dsub = dims // m
    if codebook is None:
        codebook = pq_train(
            corpus, m=m, ksub=ksub, iters=iters, dims=dims,
            id_col=id_col, vec_col=vec_col,
        ).localCheckpoint(eager=False)
    if encoded is None:
        encoded = pq_encode(
            corpus, codebook, m=m, ksub=ksub, dims=dims,
            id_col=id_col, vec_col=vec_col,
        )
    cent, valid = _collect_codebook(codebook, m, ksub, dsub)
    cnorm = (cent.astype(np.int64) ** 2).sum(axis=2)  # (m, ksub)

    q_rows = sorted(
        with_quantized(corpus.filter(F.col(id_col).isin(query_ids)), vec_col)
        .select(F.col(id_col).alias("query_id"), "qvec", "qnorm")
        .collect(),
        key=lambda r: r["query_id"],
    )
    if not q_rows:
        return corpus.sparkSession.createDataFrame([], _PAIR_TOPK_SCHEMA)
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r["qvec"], dtype=np.int64) for r in q_rows])
    q_den = np.sqrt(
        np.array([r["qnorm"] for r in q_rows], dtype=np.int64).astype(np.float64)
    )
    # (n_q, m, ksub) exact int64 sub-dot LUT
    lut = np.einsum(
        "qsd,skd->qsk", q_mat.reshape(len(q_ids), m, dsub), cent, dtype=np.int64
    )
    shortlist = max(k, rerank)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            d_ids = pdf["id"].to_numpy().astype(np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            cos = _adc_cosines(lut, cnorm, codes, q_den, m)
            # strike self-matches (query set is drawn from the corpus)
            cos[np.equal.outer(q_ids, d_ids)] = -np.inf
            top = np.argsort(-cos, axis=1, kind="stable")[:, :shortlist]
            n_take = top.shape[1]
            rows_c = np.take_along_axis(cos, top, axis=1).reshape(-1)
            keep = rows_c > -np.inf
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_take)[keep],
                    "neighbor_id": d_ids[top].reshape(-1)[keep],
                    "cosine": rows_c[keep],
                }
            )

    adc = _global_topk(encoded.mapInPandas(kernel, _PAIR_TOPK_SCHEMA), shortlist)
    if rerank <= 0:
        return _global_topk(adc, k)
    qside = (
        with_quantized(corpus.filter(F.col(id_col).isin(query_ids)), vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("qvec").alias("q_qvec"),
            F.col("qnorm").alias("q_qnorm"),
        )
    )
    return _exact_rerank(adc, qside, corpus, k, id_col, vec_col)


def build_ivf_pq_index(
    wh,
    corpus: DataFrame,
    name: str,
    stride: int = 50,
    iters: int = 1,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_modulus: int = 1,
) -> dict:
    """The composed 100 TB serving index: IVF cells prune WHICH codes a
    search scans, PQ compresses WHAT each scan reads. Materializes
    three warehouse tables -- ``<name>.codebook`` (IVF centroids),
    ``<name>.pq_codebook`` (sub, code, cv, cn), and ``<name>.codes``
    (id, cell, codes, qnorm) partitioned by cell -- in ONE transaction,
    so a crash can never pair a new codebook with old codes (the same
    torn-index hazard build_ivf_index documents).

    Both assignments (cell + m sub-codes) are computed in ONE Arrow
    pass with both codebooks in the kernel closure: the corpus is
    scanned once and never shuffled; the only wide op is the
    partitioned write. The codes table stores m ints + a norm per
    vector -- no float vectors in the index; the raw corpus table
    remains the re-rank side's only vector source."""
    import numpy as np
    import pandas as pd

    from .similarity import _assign_against, ivf_kmeans_codebook  # noqa: F401

    dsub = dims // m
    ivf_cb = ivf_kmeans_codebook(
        corpus, stride, iters, dims, id_col, vec_col, train_modulus
    ).localCheckpoint(eager=True)
    pq_cb = pq_train(
        corpus, m=m, ksub=ksub, iters=iters, dims=dims,
        id_col=id_col, vec_col=vec_col, train_modulus=train_modulus,
    ).localCheckpoint(eager=True)

    rows = ivf_cb.select("cent_id", "cv", "cn").orderBy("cent_id").collect()
    cent_ids = np.array([r["cent_id"] for r in rows], dtype=np.int64)
    cents = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in rows])
    cent_den = np.sqrt(
        np.array([r["cn"] for r in rows], dtype=np.int64).astype(np.float64)
    )
    pq_cent, pq_valid = _collect_codebook(pq_cb, m, ksub, dsub)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["qvec"].to_numpy()).astype(np.int64)
            qn = pdf["qnorm"].to_numpy().astype(np.int64)
            # IVF cell: same math/tie-rule as _assign_against
            cos = (mat @ cents.T).astype(np.float64) / (
                np.sqrt(qn.astype(np.float64))[:, None] * cent_den[None, :]
            )
            cell = cent_ids[np.argmax(cos, axis=1)]
            codes = _pq_assign_codes(mat, pq_cent, pq_valid, m, dsub)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "cell": cell,
                    "codes": list(codes),
                    "qnorm": qn,
                }
            )

    coded = (
        with_quantized(corpus, vec_col)
        .select(F.col(id_col).alias("id"), "qvec", "qnorm")
        .mapInPandas(kernel, "id bigint, cell bigint, codes array<int>, qnorm bigint")
    )
    cb_name = f"{name}.codebook"
    pq_name = f"{name}.pq_codebook"
    co_name = f"{name}.codes"
    if not wh.exists(cb_name):
        wh.create_table(cb_name, ivf_cb.schema)
    if not wh.exists(pq_name):
        wh.create_table(pq_name, pq_cb.schema)
    if not wh.exists(co_name):
        wh.create_table(co_name, coded.schema, partition_by=["cell"])
    with wh.transaction([cb_name, pq_name, co_name]) as txn:
        txn.overwrite(cb_name, ivf_cb)
        txn.overwrite(pq_name, pq_cb)
        txn.overwrite(co_name, coded)
    return {
        "cells": wh.read(cb_name).count(),
        "pq_cells": wh.read(pq_name).count(),
        "vectors": wh.read(co_name).count(),
    }


def ivf_pq_search_index(
    wh,
    name: str,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    n_probes: int = 1,
    rerank: int = 0,
    corpus: DataFrame | None = None,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN search for EXTERNAL query vectors against a persisted
    IVF-PQ index: pick each query's ``n_probes`` cells against the IVF
    codebook (driver-side, O(queries x cells)); read ONLY those cells'
    partitions of the codes table; ADC-score the codes through each
    query's exact int64 LUT with a per-query cell mask (a candidate
    only scores for queries that probed its cell); optionally re-rank
    the bounded shortlist with exact dots against ``corpus`` via an
    id-pushdown fetch. This is the full compressed serving path: the
    scan partition-prunes to probed cells AND reads m ints per vector
    instead of the float embedding.

    ``queries``: [(query_id, vector)], driver-resident by contract.
    Query ids live in the caller's id space (no self-striking). With
    ``rerank`` = 0 the returned cosine is the ADC approximation;
    ``rerank`` > 0 requires ``corpus`` (the raw-vector source) and
    returns exact cosines. A ``rerank`` at least the probed cells'
    population makes the result identical to the uncompressed
    ivf_search_index (the shortlist is then every candidate)."""
    import numpy as np
    import pandas as pd

    if not queries:
        return wh.spark.createDataFrame([], _PAIR_TOPK_SCHEMA)
    dsub = dims // m
    rows = (
        wh.read(f"{name}.codebook").select("cent_id", "cv", "cn").orderBy("cent_id").collect()
    )
    if not rows:
        raise ValueError(f"index {name} has an empty codebook")
    cent_ids = np.array([r["cent_id"] for r in rows], dtype=np.int64)
    cents = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in rows])
    cent_den = np.sqrt(
        np.array([r["cn"] for r in rows], dtype=np.int64).astype(np.float64)
    )
    pq_cent, _ = _collect_codebook(wh.read(f"{name}.pq_codebook"), m, ksub, dsub)
    pq_cnorm = (pq_cent.astype(np.int64) ** 2).sum(axis=2)

    vecs = np.array([v for _, v in queries], dtype=np.float64)
    # HALF_UP quantization == F.round (shared with ivf_search_index)
    qm = (np.sign(vecs) * np.floor(np.abs(vecs) * SCALE + 0.5)).astype(np.int64)
    qn = (qm * qm).sum(axis=1)
    q_ids = np.array([qid for qid, _ in queries], dtype=np.int64)
    q_den = np.sqrt(qn.astype(np.float64))
    cos = (qm @ cents.T).astype(np.float64) / (q_den[:, None] * cent_den[None, :])
    top = np.argsort(-cos, axis=1, kind="stable")[:, : max(1, n_probes)]
    probe_sets = [set(int(c) for c in cent_ids[t]) for t in top]
    probe_cells = sorted(set().union(*probe_sets))
    lut = np.einsum(
        "qsd,skd->qsk", qm.reshape(len(q_ids), m, dsub), pq_cent, dtype=np.int64
    )
    shortlist = max(k, rerank)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            d_ids = pdf["id"].to_numpy().astype(np.int64)
            d_cells = pdf["cell"].to_numpy().astype(np.int64)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            sc = _adc_cosines(lut, pq_cnorm, codes, q_den, m)
            for i, cells_i in enumerate(probe_sets):  # per-query cell mask
                sc[i, ~np.isin(d_cells, list(cells_i))] = -np.inf
            t = np.argsort(-sc, axis=1, kind="stable")[:, :shortlist]
            n_take = t.shape[1]
            rows_c = np.take_along_axis(sc, t, axis=1).reshape(-1)
            keep = rows_c > -np.inf
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_take)[keep],
                    "neighbor_id": d_ids[t].reshape(-1)[keep],
                    "cosine": rows_c[keep],
                }
            )

    db = wh.read(f"{name}.codes").filter(F.col("cell").isin(probe_cells))
    adc = _global_topk(db.mapInPandas(kernel, _PAIR_TOPK_SCHEMA), shortlist)
    if rerank <= 0:
        return _global_topk(adc, k)
    if corpus is None:
        raise ValueError("rerank > 0 needs the raw-vector corpus")
    qside = wh.spark.createDataFrame(
        [
            (int(q_ids[i]), [int(x) for x in qm[i]], int(qn[i]))
            for i in range(len(q_ids))
        ],
        "query_id bigint, q_qvec array<bigint>, q_qnorm bigint",
    )
    return _exact_rerank(adc, qside, corpus, k, id_col, vec_col)
