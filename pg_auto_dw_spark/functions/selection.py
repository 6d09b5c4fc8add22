"""Model-based data selection: DSIR importance weighting and hashed
linear (fastText-shape) classifier inference.

Two standard pretraining-corpus selection signals that are MODELS
applied at scale rather than per-row heuristics (those live in
functions/text.py):

- ``dsir_log_weights``: Data Selection via Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169): score every source document by
  the log-likelihood ratio of a target-domain hashed-unigram LM to the
  source LM. Documents that "look like" the target domain get high
  weight; ``importance_resample`` then draws a Gumbel-top-n sample
  proportional to exp(weight).
- ``hashed_linear_score``: inference for a linear classifier over
  hashed bag-of-words features -- the fastText-style quality-classifier
  serving shape (a trained weight vector applied to 100 TB of text;
  the weights here can come from any trainer, ``synthetic_linear_weights``
  provides the deterministic stand-in the oracle row pins).

Scale contract (the reason these are one module): both operators
reduce the corpus through a BOUNDED feature space (``buckets`` rows,
fixed at build time), so the "model" side of every join is bounded by
construction and is explicitly broadcast -- the corpus-sized token
stream never shuffles for the join; the only wide exchanges are
map-side-combined aggregations (bucket counts, per-doc rollups).
Hashing is the md5-prefix integer construction shared with the
SimHash/minhash oracles: plain integer arithmetic any engine
reproduces bit-for-bit, which is how the DuckDB rows verify these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .corpus import word_tokens
from .sampling import MODULUS, sample_rank

DSIR_BUCKETS = 8192
CLASSIFIER_BUCKETS = 4096


def token_bucket(col, buckets: int):
    """Deterministic token -> [0, buckets) feature hash: first 32 bits
    of md5 as an integer (the cross-engine-stable construction the
    SimHash oracle established), modulo the bucket count."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % buckets
    )


def _token_stream(
    docs: DataFrame, text_col: str, id_col: str, buckets: int, *extra_cols
) -> DataFrame:
    """(id, b, *extra) hashed-token stream: one scan, narrow explode.
    Docs fan out across cores before the explode (the minhash/gram
    precedent -- one parquet split would otherwise serialize the whole
    tokenize+hash stream into one task)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par, id_col).select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__w"), *extra_cols
    )
    carried = [c for c in base.columns if c not in (id_col, "__w")]
    return base.select(
        id_col, token_bucket(F.col("__w"), buckets).alias("b"), *carried
    )


def _doc_bucket_counts(
    docs: DataFrame, text_col: str, id_col: str, buckets: int, *extra_cols
) -> DataFrame:
    """(id, b, *extra, c) sparse document-feature matrix: per-doc
    hashed-bucket token counts. ONE tokenize+hash pass (map-side-
    combined groupBy); the matrix is no larger than the raw token
    stream (within-doc repeats collapse) and every downstream consumer
    -- model-count aggregation AND scoring join -- reads it instead of
    re-deriving tokens, halving the tokenization work and shrinking
    the scoring join's probe side. This is the classic bag-of-words
    materialization; at warehouse scale it is the artifact you'd
    persist alongside the corpus snapshot. ``extra_cols`` must be
    functionally dependent on the doc id (they join the grouping
    key)."""
    base = _token_stream(docs, text_col, id_col, buckets, *extra_cols)
    carried = [c for c in base.columns if c not in (id_col, "b")]
    return base.groupBy(id_col, "b", *carried).agg(F.count(F.lit(1)).alias("c"))


def dsir_log_weights(
    docs: DataFrame,
    target,
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance log-weight: sum over the doc's
    hashed unigram tokens of ``ln p_target(b) - ln p_source(b)``, both
    add-1-smoothed over ``buckets`` feature buckets. ``target`` is a
    Column predicate over ``docs`` rows selecting the target-domain
    subset (the corpus-self form; an external target corpus plugs in
    by unioning it in with the predicate as its marker).

    Shape: ONE hashed-token pass materializes the (doc, bucket, count)
    feature matrix (``_doc_bucket_counts``), which then serves BOTH
    sides -- the model is a map-side-combined groupBy(bucket) over the
    matrix (each matrix row carries its doc's target flag, so source
    and target counts aggregate together; totals ride along as a
    broadcast one-row frame), and scoring is the bounded log-ratio
    table (<= ``buckets`` rows BY CONSTRUCTION, explicitly broadcast
    -- unlike the Zipf-unbounded vocabulary joins in text.py, which
    stay AQE-decided) joined back onto the SAME matrix with a
    count-weighted (id) rollup. Tokenize/hash runs once; the matrix
    lineage is read twice -- at warehouse scale persist the matrix
    and/or the ratio table once per (snapshot, target domain) and
    reuse, the LM-artifact contract shared with unigram_logprob.

    Output: (id, n_tokens, log_weight double, nats). Docs with no
    tokens emit no row."""
    # Lazily pinned (r16, guide section 2.4): the matrix lineage had
    # three executions per action -- the model aggregation (cnt), the
    # one-row totals broadcast (tot re-derives cnt independently), and
    # the scoring join -- each re-running the corpus tokenize+hash
    # pass (the plan showed three identical scan chains). One
    # materialization now feeds all three reads; the docstring's
    # warehouse-scale artifact contract is unchanged.
    mat = _doc_bucket_counts(
        docs, text_col, id_col, buckets, target.cast("int").alias("is_t")
    ).localCheckpoint(eager=False)
    cnt = mat.groupBy("b").agg(
        F.sum("c").alias("c_s"), F.sum(F.col("c") * F.col("is_t")).alias("c_t")
    )
    tot = cnt.agg(F.sum("c_s").alias("n_s"), F.sum("c_t").alias("n_t"))
    ratio = (
        cnt.crossJoin(F.broadcast(tot))  # one row, by construction
        .select(
            "b",
            (
                F.log((F.col("c_t") + 1).cast("double") / (F.col("n_t") + buckets))
                - F.log((F.col("c_s") + 1).cast("double") / (F.col("n_s") + buckets))
            ).alias("lr"),
        )
    )
    return (
        mat.join(F.broadcast(ratio), on="b")  # <= buckets rows, by construction
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lr")).alias("log_weight"),
        )
    )


def importance_resample(
    weights: DataFrame,
    n: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Deterministic Gumbel-top-n importance resampling over a DSIR
    weight frame: taking the top ``n`` rows by ``log_weight +
    Gumbel(key)`` samples n docs without replacement with probability
    proportional to exp(log_weight) -- the exact resampling step of
    DSIR -- and the Gumbel noise comes from the deterministic
    ``sample_rank`` hash (u = (rank + 0.5) / MODULUS, g = -ln(-ln u)),
    so the draw is reproducible across runs and partitionings.

    Scale: global top-n compiles to TakeOrderedAndProject (per-
    partition heap + driver merge of n-row heads), no full sort
    shuffle -- right for request-sized n. For selecting a large
    FRACTION of a 100 TB corpus, threshold on ``log_weight`` directly
    (a narrow filter) instead of materializing a global order."""
    u = (sample_rank(F.col(id_col)) + 0.5) / F.lit(float(MODULUS))
    key = F.col(weight_col) + (-F.log(-F.log(u)))
    return (
        weights.withColumn("__gumbel_key", key)
        .orderBy(F.col("__gumbel_key").desc(), F.col(id_col))
        .limit(n)
        .drop("__gumbel_key")
    )


def synthetic_linear_weights(spark, buckets: int = CLASSIFIER_BUCKETS) -> DataFrame:
    """Deterministic stand-in weight table (b, wt) for
    ``hashed_linear_score``: integer micro-units in [-500000, 500003)
    via the Knuth multiplicative hash, reproducible in any engine --
    the oracle row pins inference against exactly this table. A real
    deployment replaces this with trained weights (same schema)."""
    return spark.range(buckets).select(
        F.col("id").alias("b"),
        ((F.col("id") + 1) * F.lit(2654435761) % MODULUS - 500000).alias("wt"),
    )


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame | None = None,
    buckets: int = CLASSIFIER_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear classifier inference over hashed bag-of-words features:
    each token hashes to a bucket, the doc's raw score is the SUM of
    its buckets' integer weights (micro-units), and ``score`` is the
    token-mean in weight units -- the fastText serving shape
    (w . phi(doc) / |doc|) with the embedding-lookup replaced by the
    hash trick, which is what makes it feasible on a corpus that never
    fits a vocabulary: the model is ``buckets`` rows, period.

    Shape: one scan + narrow explode into the (doc, bucket, count)
    matrix (``_doc_bucket_counts``), one BROADCAST join against the
    bounded weight table (never a corpus shuffle), one map-side-
    combined count-weighted (id) rollup. ``w_sum`` stays exact integer
    (micro-units) -- the oracle hashes only integers.

    Output: (id, n_tokens, w_sum bigint, score double)."""
    if weights is None:
        weights = synthetic_linear_weights(docs.sparkSession, buckets)
    mat = _doc_bucket_counts(docs, text_col, id_col, buckets)
    return (
        mat.join(F.broadcast(weights), on="b")  # <= buckets rows by construction
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("wt")).alias("w_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            "w_sum",
            (F.col("w_sum").cast("double") / (F.col("n_tokens") * 1e6)).alias("score"),
        )
    )


def hashed_idf_model(
    docs: DataFrame,
    dims: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_n_docs: bool = False,
):
    """The FIT half of ``hashed_embedding``: smoothed IDF weight per
    hashed dimension, ``log((n_docs + 1) / (df + 1)) + 1`` with df the
    number of docs whose tokens touch the dimension and n_docs the
    count of docs with at least one token.

    ONE corpus scan: a single rollup aggregation computes every
    per-dim distinct-doc count AND the global distinct-doc count
    together (the grand-total grouping IS n_docs). The result is
    <= dims + 1 rows by construction -- a bounded model collect, same
    contract as bloom_build's gram set and bpe_train's vocabulary.
    Callers that vectorize many corpora against one reference model
    can persist this dict like any other model artifact."""
    import math

    # same pre-explode fan-out as the transform (and minhash): the fit
    # tokenizes the whole corpus too
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par, id_col).select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__w")
    )
    h = F.conv(F.substring(F.md5("__w"), 1, 8), 16, 10).cast("bigint")
    toks = base.select(F.col(id_col), (h % dims).alias("dim"))
    rows = (
        toks.rollup("dim")
        .agg(
            F.countDistinct(id_col).alias("df"),
            F.grouping("dim").alias("g"),
        )
        .collect()
    )
    n_docs = next((r["df"] for r in rows if r["g"] == 1), 0)
    model = {
        int(r["dim"]): math.log((n_docs + 1) / (r["df"] + 1)) + 1.0
        for r in rows
        if r["g"] == 0
    }
    # with_n_docs: callers persisting the model (semsearch) also need
    # the smoothed default log(n_docs + 1) + 1 for dims the fit corpus
    # never touched (df = 0) -- query text can hash anywhere
    return (model, int(n_docs)) if with_n_docs else model


def hashed_embedding(
    docs: DataFrame,
    dims: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_idf: bool = True,
    idf_model: dict[int, float] | None = None,
) -> DataFrame:
    """Signed feature-hashing TF-IDF document vectors (the hashing
    vectorizer of Weinberger et al. 2009): every token hashes to a
    dimension (md5 % dims) and an independent +-1 sign bit (unbiased
    collisions), per-doc signed term frequencies are weighted by
    smoothed IDF and L2-normalized into a dense array<double>[dims].
    This closes the text -> vector loop with built-ins only: the
    output column drops straight into the ANN stack
    (brute_force_topk / ivf / PQ all consume any array-typed
    ``embedding`` via with_quantized), so a corpus with no precomputed
    embeddings still gets semantic near-dup and similarity search.

    Shape -- the MLlib-style FIT + TRANSFORM two-pass (the minimum for
    any IDF weighting: the model must see the whole corpus before any
    vector can be weighted). FIT: one tokenize+hash pass reduced to the
    distinct (id, dim) pairs, then ONE rollup aggregation yields every
    per-dim document frequency AND the global doc count together; the
    model is <= dims + 1 rows BY CONSTRUCTION and collects to the
    driver (the bounded-model-collect precedent of bloom_build /
    bpe_train), entering the transform as a literal map -- no join at
    all on the corpus side. TRANSFORM: one tokenize+hash pass ->
    map-side-combined (id, dim) signed-tf aggregation -> one (id)
    aggregation assembling the dense vector; densification and L2
    normalization are pure array expressions. Exactly two corpus
    scans total (the naive dataflow form evaluated the corpus THREE
    times -- Catalyst cannot reuse the differently-pruned exchange
    subtrees under dfreq / n_docs / the final join; measured 3.5s ->
    see SCALE.md round 9). No Python anywhere.

    Output: (id, embedding array<double>[dims], n_tokens). Docs with
    no tokens emit no row; an all-cancelled (zero-norm) vector stays
    all-zero rather than dividing by zero."""
    # fan docs across cores BEFORE the explode (the minhash precedent,
    # dedup.py): a small corpus arrives as one parquet split, and
    # without this the entire tokenize+md5 stream runs in ONE task
    # ahead of the first shuffle (measured 2.1s -> 0.9s at sf0.1)
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par, id_col).select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__w")
    )
    h = F.conv(F.substring(F.md5("__w"), 1, 8), 16, 10).cast("bigint")
    sign = (F.shiftright(h, 15) % 2 * 2 - 1).cast("double")
    toks = base.select(id_col, (h % dims).alias("dim"), sign.alias("s"))
    # a caller-supplied model (semsearch: embed new text against a
    # PERSISTED reference model) skips the fit pass entirely. It must
    # cover EVERY dim in [0, dims): new text hashes anywhere, and a
    # missing key would silently NULL that coordinate via element_at --
    # fill unseen dims with the smoothed default log(n_docs+1)+1
    # before passing (semsearch does).
    if idf_model is not None:
        if not use_idf:
            # a model that passes validation but is then silently
            # ignored is a contract trap -- refuse the contradiction
            raise ValueError(
                "idf_model supplied with use_idf=False: the model would "
                "be validated then ignored; drop the model or set "
                "use_idf=True"
            )
        missing = [d for d in range(dims) if d not in idf_model]
        if missing:
            raise ValueError(
                f"idf_model must cover every dim in [0, {dims}); missing "
                f"{missing[:5]}{'...' if len(missing) > 5 else ''}"
            )
        idf_by_dim = idf_model
    else:
        idf_by_dim = (
            hashed_idf_model(docs, dims, text_col, id_col) if use_idf else {}
        )

    return _embedding_from_toks(toks, dims, use_idf, idf_by_dim, id_col)


def _embedding_from_toks(
    toks: DataFrame, dims: int, use_idf: bool, idf_by_dim, id_col: str
) -> DataFrame:
    """TRANSFORM half over a prebuilt (id, dim, s) hashed-token frame
    -- shared by ``hashed_embedding`` and ``hashed_embedding_fit`` so
    the fused fit+transform path reuses the identical assembly."""
    # sparse two-level assembly, O(tokens) work: (id, dim) signed-tf
    # aggregation (map-side combined), then one (id) aggregation
    # densifying <= dims entries per doc. A wide per-dim
    # conditional-sum variant (one shuffle, full codegen) was measured
    # and REJECTED: it evaluates dims conditions per token --
    # O(tokens x dims) -- and lost to this shape end-to-end at sf0.1
    # despite the ObjectHashAggregate here (SCALE.md round 9).
    mat = toks.groupBy(id_col, "dim").agg(
        F.sum("s").alias("tf_signed"), F.count(F.lit(1)).alias("tf")
    )
    if use_idf:
        # the <= dims-entry model enters the plan as a LITERAL map --
        # no corpus-side join for the model, ever
        idf_expr = F.element_at(
            F.create_map(
                *[
                    x
                    for d, v in sorted(idf_by_dim.items())
                    for x in (F.lit(int(d)), F.lit(float(v)))
                ]
            ),
            F.col("dim").cast("int"),
        )
        mat = mat.withColumn("w", F.col("tf_signed") * idf_expr)
    else:
        mat = mat.withColumn("w", F.col("tf_signed").cast("double"))
    dense = (
        mat.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("dim").cast("int"), F.col("w")))
            ).alias("__m"),
            F.sum("tf").alias("n_tokens"),
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda i: F.coalesce(F.element_at("__m", i.cast("int")), F.lit(0.0)),
            ).alias("__v"),
            "n_tokens",
        )
    )
    # Bind the norm to a column BEFORE the normalizing transform (r16,
    # guide section 4/7.2): a lambda body re-evaluates every expression
    # subtree it references per array element (the word_tokens module
    # contract), so the inlined form re-ran the 64-step sum-of-squares
    # aggregate 64 times per row -- measured 1.76s -> 0.14s on the
    # chunk-embedding tail with bit-identical output. The projection
    # boundary survives CollapseProject because __norm is referenced
    # twice (the guard and the lambda) and is not a cheap expression.
    norm = F.sqrt(
        F.aggregate("__v", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        dense.withColumn("__norm", norm)
        .select(
            id_col,
            F.when(
                F.col("__norm") > 0,
                F.transform("__v", lambda x: x / F.col("__norm")),
            ).otherwise(F.col("__v")).alias("embedding"),
            "n_tokens",
        )
    )


def hashed_embedding_fit(
    docs: DataFrame,
    dims: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """FIT + TRANSFORM with ONE tokenize+hash pass (r16, guide section
    1.2): callers that need both the embeddings AND the persisted IDF
    geometry (semsearch's chunk index build) previously ran
    ``hashed_idf_model`` then ``hashed_embedding`` -- two full
    tokenize + md5 passes over the corpus. Here the hashed (id, dim,
    sign) token frame is built once and lazily pinned; the IDF rollup
    (which materializes the pin) and the transform both read it. The
    arithmetic is identical to the two-call form: same tokenization,
    same md5 prefix hash, same rollup-derived df/n_docs, same
    smoothed-default fill for unseen dims, same transform assembly.

    Returns (embedding frame, FITTED idf dict -- only dims the corpus
    touched, exactly ``hashed_idf_model``'s shape, so callers persist
    the same geometry -- and n_docs). The transform itself uses the
    smoothed default ``log(n_docs + 1) + 1`` for unseen dims, the
    same fill ``_filled_model`` applies in the two-call form."""
    import math

    par = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.repartition(par, id_col).select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__w")
    )
    h = F.conv(F.substring(F.md5("__w"), 1, 8), 16, 10).cast("bigint")
    sign = (F.shiftright(h, 15) % 2 * 2 - 1).cast("double")
    toks = base.select(
        F.col(id_col), (h % dims).alias("dim"), sign.alias("s")
    ).localCheckpoint(eager=False)
    rows = (
        toks.rollup("dim")
        .agg(F.countDistinct(id_col).alias("df"), F.grouping("dim").alias("g"))
        .collect()
    )
    n_docs = int(next((r["df"] for r in rows if r["g"] == 1), 0))
    fitted = {
        int(r["dim"]): math.log((n_docs + 1) / (r["df"] + 1)) + 1.0
        for r in rows
        if r["g"] == 0
    }
    default = math.log(float(n_docs + 1)) + 1.0
    model = {d: fitted.get(d, default) for d in range(dims)}
    emb = _embedding_from_toks(toks, dims, True, model, id_col)
    return emb, fitted, n_docs


def prepare_classifier_features(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    buckets: int = CLASSIFIER_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The pinned (id, __y, b, __x) normalized feature matrix
    ``train_linear_classifier`` iterates over: hashed-bucket token
    counts per labeled doc, normalized to within-doc frequencies.
    Split out (r15) so callers that need BOTH the training run and the
    matrix itself (contract aggregations, feature audits) tokenize the
    corpus exactly once.

    Every per-example key is (id, __y), NOT the id alone: the same id
    can legitimately appear in BOTH seed sets (pos/neg drawn from
    different corpora with independent id spaces), and an id-only key
    would pool the two examples' token counts in this normalization
    AND cross-product the gradient join."""
    labeled = pos_docs.select(
        F.col(id_col), F.col(text_col), F.lit(1.0).alias("__y")
    ).unionByName(
        neg_docs.select(F.col(id_col), F.col(text_col), F.lit(0.0).alias("__y"))
    )
    mat = _doc_bucket_counts(labeled, text_col, id_col, buckets, "__y")
    return (
        mat.withColumn(
            "__x",
            F.col("c").cast("double")
            / F.sum("c").over(Window.partitionBy(id_col, "__y")).cast("double"),
        )
        .select(id_col, "__y", "b", "__x")
        .localCheckpoint(eager=True)
    )


def train_linear_classifier(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    buckets: int = CLASSIFIER_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 0.0,
    features: DataFrame | None = None,
) -> tuple[DataFrame, list[float]]:
    """TRAIN the fastText-shape quality classifier that
    ``hashed_linear_score`` serves: full-batch logistic regression
    over the hashed bag-of-words features, distributed the same way
    the inference is -- the corpus-sized work (tokenize + hash +
    per-doc rollups) shuffles once per pass, and the MODEL never
    exceeds ``buckets`` rows. Completes the selection family: DSIR and
    ``hashed_linear_score`` apply models; this produces one from
    labeled seed sets (the wikipedia-vs-crawl recipe behind GPT-3/
    LLaMA-style quality filters).

    Features match serving exactly: x_b = count_b / n_tokens, so the
    learned weights plug straight into ``hashed_linear_score`` (same
    w . phi / |doc| score, up to the documented micro-unit rounding).

    Per iteration (the labeled TRAINING SAMPLE is bounded by contract
    -- thousands to low millions of docs; the 100 TB corpus is scored
    later by inference): one broadcast join of the <= buckets weight
    rows against the PINNED feature matrix, a doc-grain rollup for the
    margins, and a bucket-grain rollup for the gradient. No Python in
    the plan; sigmoid/log stay JVM expressions.

    Returns (weights, losses): weights as the serving-schema (b, wt)
    micro-unit BIGINT table (buckets with no evidence get wt=0), and
    the per-iteration mean log-loss trace (evaluated BEFORE each step,
    so a decreasing list is the convergence certificate; tests pin
    monotone descent on separable fixtures). A bias term is learned
    for loss/calibration but NOT emitted: ``hashed_linear_score`` is a
    ranker (selection thresholds on relative score) and a constant
    offset never changes the ranking.

    ``features`` (r15 optimization seam): a pre-built pinned feature
    matrix from ``prepare_classifier_features`` -- callers that ALSO
    need the matrix (the registered contract row aggregates its
    training-population integers from it) pass it in so the corpus is
    tokenized once, not twice."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    spark = pos_docs.sparkSession
    feats = (
        features
        if features is not None
        else prepare_classifier_features(
            pos_docs, neg_docs, buckets=buckets, text_col=text_col, id_col=id_col
        )
    )
    n_docs = feats.select(id_col, "__y").distinct().count()
    if n_docs == 0:
        raise ValueError("train_linear_classifier: no tokenized training docs")

    weights = spark.range(buckets).select(
        F.col("id").alias("b"), F.lit(0.0).alias("__w")
    )
    bias = 0.0
    losses: list[float] = []
    prev_scored = None
    for it in range(iters):
        # pin the per-example margins: both the loss aggregate and the
        # gradient join read ``scored``, and without the pin the heavy
        # subtree (broadcast join over the feature matrix + doc rollup)
        # ran TWICE per iteration (r15, guide section 5 caching rule --
        # reused AND expensive to recompute). Pinned via persist (r16):
        # the loss aggregate below is the ONE action that computes the
        # margins AND fills the cache, so the former eager-checkpoint
        # materialization job disappears -- one job per iteration. The
        # PREVIOUS iteration's cache is released once this iteration's
        # aggregate has run (that action's broadcast build was its last
        # reader); the final iteration's bounded margin frame is left
        # to the ContextCleaner.
        scored = (
            feats.join(F.broadcast(weights), "b")
            .groupBy(id_col, "__y")
            .agg(F.sum(F.col("__x") * F.col("__w")).alias("__s"))
            .withColumn(
                "__p", F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("__s") + F.lit(bias))))
            )
            .persist()
        )
        # clamp the log args: a perfectly-separated fixture drives p to
        # exactly 0/1 in fp and log would return -inf
        eps = 1e-12
        agg = scored.agg(
            F.avg(
                -(
                    F.col("__y") * F.log(F.greatest(F.col("__p"), F.lit(eps)))
                    + (1 - F.col("__y"))
                    * F.log(F.greatest(1 - F.col("__p"), F.lit(eps)))
                )
            ).alias("loss"),
            F.sum(F.col("__p") - F.col("__y")).alias("gbias"),
        ).first()
        losses.append(float(agg["loss"]))
        if prev_scored is not None:
            prev_scored.unpersist()
        prev_scored = scored
        grad = (
            scored.select(
                id_col, "__y", (F.col("__p") - F.col("__y")).alias("__r")
            )
            .join(feats.select(id_col, "__y", "b", "__x"), [id_col, "__y"])
            .groupBy("b")
            .agg(F.sum(F.col("__r") * F.col("__x")).alias("__g"))
        )
        step = F.lit(lr) / F.lit(float(n_docs))
        weights = (
            weights.join(grad, "b", "left")
            .select(
                "b",
                (
                    F.col("__w") * (1.0 - F.lit(lr * l2))
                    - step * F.coalesce(F.col("__g"), F.lit(0.0))
                ).alias("__w"),
            )
            # cut the per-iteration lineage; LAZY (r15): the next
            # iteration's broadcast build (or the caller's first read)
            # materializes it -- an eager pin here was one extra action
            # per iteration for a <= buckets-row table
            .localCheckpoint(eager=False)
        )
        bias = bias - lr * float(agg["gbias"]) / n_docs
    out = weights.select(
        "b", F.round(F.col("__w") * 1_000_000).cast("bigint").alias("wt")
    )
    return out, losses
