"""Training-corpus pipeline facade: the one-call composition of the
package's data-prep operators, in the order a pretraining team runs
them.

    from pg_auto_dw_spark.pipeline import CorpusPipelineConfig, build_training_corpus

    result = build_training_corpus(docs, benchmark=eval_docs,
                                   config=CorpusPipelineConfig(n_shards=64))
    result.placement      # (doc_id, seq_id, seq_offset, ...) packing map
    result.sharded        # survivors + (shard, shuffle_key)
    result.summary()      # per-stage row counts (forces computation)

Stage order and the reason for it:

1. rule filter (``text.gopher_rules``)       -- cheapest first: a pure
   codegen scan drops junk before anything pays a shuffle for it.
1.5 trained quality classifier (optional, r12) -- the broadcast-model
   ``selection.hashed_linear_score`` scan over the rule survivors;
   the batch twin of the streaming landing-zone gate (train once with
   ``selection.train_linear_classifier``, gate everywhere).
2. exact dedup (``dedup.dedup_exact``)       -- one digest shuffle;
   keeps each text's canonical (min-id) copy.
3. Bloom decontamination (``corpus.bloom_decontaminate``) -- zero-
   shuffle in-place probe against the benchmark bitset (skipped when
   no benchmark is given).
4. temperature mixture (``sampling.temperature_sample``) -- optional,
   rebalances sources under a row budget; zero-shuffle deterministic.
5. token counting (``tokenizer.bpe_token_counts`` when
   ``exact_tokens`` else the regex proxy) and packing
   (``corpus.pack_sequences``) -- the placement map.
6. epoch sharding (``shard.shard_assignments``) -- the one sanctioned
   full shuffle happens in the WRITER (``shard.write_training_shards``),
   not here; this facade stays lazy.

Every stage is the already-tested operator -- this module adds only
the composition and the stage-count report, no new semantics. All
results are lazy DataFrames with ONE exception: ``exact_tokens=True``
trains the BPE tokenizer at build time (tokenizer training is a
bounded driver loop over the corpus word frequencies and cannot be
lazy) -- leave it False to keep construction free. The exact counts
then also drive the placement map (``pack_sequences`` receives them),
so ``token_counts`` and ``placement`` always share ONE accounting:
mixing exact counts with the proxy-counted placement would misalign
every sequence boundary the packing writer slices.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CorpusPipelineConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    # stage 1: rule filter (None disables)
    min_words: int | None = 10
    min_stopwords: int = 1
    # stage 1.5 (r12): trained-classifier quality gate (None disables)
    # -- the batch twin of the streaming landing-zone gate: a (b, wt)
    # weight table from selection.train_linear_classifier, served via
    # the broadcast-model hashed_linear_score scan BEFORE the dedup
    # digest shuffle pays for junk. Docs scoring under
    # min_quality_score (or with zero tokens -- fail closed) drop.
    # Unlike the streaming gate this keys on doc ids: the facade
    # contract already requires unique ids (every semi-join stage does).
    quality_weights: DataFrame | None = None
    min_quality_score: float = 0.0
    # rate form of the gate: keep the top fraction BY SCORE instead of
    # an absolute threshold. The serving score is a bias-free ranker,
    # so absolute operating points do not transfer across corpora
    # (measured: on the narrow-vocabulary synthetic corpus every doc
    # scores ~-0.014 and a 0.0 threshold drops everything); "keep the
    # top 30%" is the knob quality filtering actually turns. Stays
    # LAZY: the cutoff is a percentile_approx aggregate broadcast back
    # onto the score frame, never a global sort or a driver action.
    # Semantics: keep rows scoring STRICTLY ABOVE the approximate
    # (1 - keep_fraction) quantile -- percentile_approx returns a real
    # score from the frame, and >= would admit every row tied with the
    # boundary element (on a small or heavily-tied frame that can be
    # far more than the asked fraction; a fully-tied frame would keep
    # 100%). Strictly-above fails CLOSED on ties instead: at corpus
    # scale with continuous scores the kept fraction tracks
    # keep_fraction, and a degenerate all-tied score column keeps
    # nothing -- which is the right loud outcome for a model that
    # cannot rank the corpus. Corollary (r12 ADVICE): on COARSELY
    # QUANTIZED scores the kept fraction can undershoot the request
    # badly (every row tied with the boundary value is dropped);
    # keep_fraction == 1.0 is special-cased to skip the cutoff filter
    # entirely (the strictly-above rule would otherwise drop the
    # min-tied rows, making "keep 100%" unexpressible). When set,
    # min_quality_score is ignored.
    quality_keep_fraction: float | None = None
    # stage 2: exact dedup
    exact_dedup: bool = True
    # stage 3: decontamination
    bloom_m_bits: int | None = None
    gram_n: int = 8
    # stage 4: mixture (strata_col None disables)
    strata_col: str | None = None
    alpha: float = 0.5
    budget_rows: int | None = None
    # stage 5: tokens + packing
    exact_tokens: bool = False
    bpe_merges: int = 200
    seq_tokens: int = 2048
    # stage 6: sharding
    n_shards: int = 64
    seed: int = 0
    # cache the post-decontamination survivors once: the facade hands
    # the SAME frame to the mixture planner's strata collect, the token
    # counter, the packer, the sharder and summary() -- without a pin,
    # every one of those actions re-runs the rule scan + dedup shuffle
    # + bloom probe (measured 6x recompute in summary() at sf0.1).
    # Spark persist() is recompute-on-loss (the chain is deterministic,
    # so a lost block is rebuilt correctly, unlike a checkpoint pin).
    # Leave False at 100 TB batch scale -- there the right
    # materialization is writing survivors to the warehouse and fanning
    # out from the table; this flag is for interactive/audit sessions.
    persist_survivors: bool = False


@dataclass
class CorpusPipelineResult:
    input: DataFrame
    survivors: DataFrame
    token_counts: DataFrame
    placement: DataFrame
    sharded: DataFrame
    stages: list[tuple[str, DataFrame]] = field(default_factory=list)
    # the frame persist_survivors pinned (None when the flag is off):
    # an intermediate of the lazy chain, exposed so callers can release
    # the storage -- without this handle a long-lived session would
    # accumulate one pinned survivors set per facade call
    pinned: DataFrame | None = None
    # the exact config the build ran under (manifest input)
    config: "CorpusPipelineConfig | None" = None

    def summary(self) -> list[tuple[str, int]]:
        """Per-stage surviving row counts, in stage order (forces one
        count per stage -- call once, on purpose)."""
        return [(name, df.count()) for name, df in self.stages]

    def release(self) -> None:
        """Unpersist the pinned survivors frame (no-op when
        persist_survivors was off)."""
        if self.pinned is not None:
            self.pinned.unpersist()

    def manifest(self, summary: list[tuple[str, int]] | None = None) -> dict:
        """Reproducibility record of the build: the full config (every
        threshold, seed, shard count -- the knobs that make two runs
        comparable) plus the per-stage row counts. JSON-serializable;
        write it next to the shards (warehouse table or sidecar file)
        so a training run can name exactly which corpus build it
        consumed. Pass a precomputed ``summary()`` to avoid recounting;
        otherwise one count per stage runs here. Non-scalar config
        values (the quality-weights FRAME is a model artifact, not a
        knob) serialize as a type marker -- persist the model itself
        as its own warehouse table and record THAT table name next to
        this manifest."""
        from dataclasses import fields

        cfgd = {}
        if self.config is not None:
            for f in fields(self.config):
                v = getattr(self.config, f.name)
                cfgd[f.name] = (
                    v
                    if isinstance(v, (int, float, str, bool, type(None)))
                    else f"<{type(v).__name__}>"
                )
        return {
            "config": cfgd,
            "stages": [list(s) for s in (summary or self.summary())],
        }


def build_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CorpusPipelineConfig | None = None,
) -> CorpusPipelineResult:
    from .functions.corpus import bloom_decontaminate, pack_sequences
    from .functions.dedup import dedup_exact
    from .functions.sampling import temperature_sample
    from .functions.shard import shard_assignments
    from .functions.text import gopher_rules, token_counts
    from .functions.tokenizer import bpe_token_counts

    cfg = config or CorpusPipelineConfig()
    if cfg.strata_col is not None and not (cfg.budget_rows and cfg.budget_rows > 0):
        raise ValueError(
            "the mixture stage (strata_col set) needs budget_rows >= 1 -- "
            "temperature rates are rates OF a budget"
        )
    id_col, text_col = cfg.id_col, cfg.text_col
    stages: list[tuple[str, DataFrame]] = [("input", docs)]
    cur = docs

    if cfg.min_words is not None:
        verdicts = gopher_rules(
            cur, text_col, id_col,
            min_words=cfg.min_words, min_stopwords=cfg.min_stopwords,
        )
        keep = verdicts.filter(F.col("gopher_pass")).select(id_col)
        cur = cur.join(keep, id_col, "left_semi")
        stages.append(("gopher_rules", cur))

    if cfg.quality_weights is not None:
        from .functions.selection import hashed_linear_score

        scored = hashed_linear_score(
            cur, weights=cfg.quality_weights, text_col=text_col, id_col=id_col
        )
        if cfg.quality_keep_fraction is not None:
            if not 0 < cfg.quality_keep_fraction <= 1:
                raise ValueError("quality_keep_fraction must be in (0, 1]")
            if cfg.quality_keep_fraction == 1.0:
                # keep-100%: no cutoff (strictly-above would drop the
                # rows tied with the min score -- r12 ADVICE); rows
                # with no score (zero tokens) still fail closed below
                keep = scored.select(id_col)
            else:
                cutoff = scored.agg(
                    F.percentile_approx(
                        "score", F.lit(1.0 - cfg.quality_keep_fraction)
                    ).alias("__qcut")
                )
                keep = scored.crossJoin(F.broadcast(cutoff)).filter(
                    F.col("score") > F.col("__qcut")  # strictly above: see config note
                ).select(id_col)
        else:
            keep = scored.filter(
                F.col("score") >= cfg.min_quality_score
            ).select(id_col)
        # zero-token docs have no score row and fail closed (left_semi)
        cur = cur.join(keep, id_col, "left_semi")
        stages.append(("quality_classifier", cur))

    if cfg.exact_dedup:
        canon = dedup_exact(cur, text_col, id_col).select(
            F.col("canonical_id").alias(id_col)
        )
        cur = cur.join(canon, id_col, "left_semi")
        stages.append(("exact_dedup", cur))

    if benchmark is not None:
        cur = bloom_decontaminate(
            cur, benchmark, n=cfg.gram_n, m_bits=cfg.bloom_m_bits,
            text_col=text_col, id_col=id_col,
        )
        stages.append(("bloom_decontaminate", cur))

    pinned: DataFrame | None = None
    if cfg.persist_survivors:
        cur = cur.persist()
        pinned = cur

    if cfg.strata_col is not None:
        cur = temperature_sample(
            cur, id_col, cfg.strata_col, alpha=cfg.alpha,
            budget_rows=cfg.budget_rows,
        )
        stages.append(("temperature_sample", cur))

    if cfg.exact_tokens:
        counts = bpe_token_counts(cur, cfg.bpe_merges, text_col, id_col)
        # the placement map MUST pack with the same counts it reports
        placement = pack_sequences(
            cur, cfg.seq_tokens, text_col, id_col, token_counts_df=counts
        )
    else:
        counts = token_counts(cur, text_col, id_col).select(
            id_col, F.col("n_bpe_tokens")
        )
        placement = pack_sequences(cur, cfg.seq_tokens, text_col, id_col)
    sharded = shard_assignments(cur, cfg.n_shards, cfg.seed, id_col)
    stages.append(("sharded", sharded))
    return CorpusPipelineResult(
        input=docs,
        survivors=cur,
        token_counts=counts,
        placement=placement,
        sharded=sharded,
        stages=stages,
        pinned=pinned,
        config=cfg,
    )


def materialize_training_corpus(
    wh,
    name: str,
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CorpusPipelineConfig | None = None,
    seqs_per_shard: int = 1024,
) -> tuple[CorpusPipelineResult, dict]:
    """``build_training_corpus`` carried all the way to what a trainer
    MOUNTS: the pipeline's survivors feed ``corpus.write_packed_corpus``,
    which commits the loader contract (partitioned shards + manifest +
    placement + config) in one warehouse transaction, and the
    pipeline's reproducibility record lands beside it as
    ``<name>.build`` in a second commit of the same call. Returns
    (pipeline_result, writer_totals).

    Proxy-tokenizer path only: the writer hashes the SAME regex tokens
    the pipeline's placement counted, so counts and stream agree
    position by position. ``exact_tokens`` builds pack with REAL BPE
    counts the hashed-vocab writer cannot render -- materialize those
    through ``corpus.assemble_packed_sequences`` instead; the error
    says so rather than silently re-counting with the proxy.

    Survivors are force-pinned for the run (r15 review): this facade
    consumes the filter chain three ways -- the placement/stream
    render inside the writer, and the per-stage counts -- which
    unpinned would re-execute the whole gopher/dedup/bloom chain once
    per consumer (the exact recompute the persist_survivors config
    note warns about). The pin is left in place on return (the
    returned frames stay cheap to reuse); call ``result.release()``
    when done with them."""
    import json
    from dataclasses import replace

    from .functions.corpus import write_packed_corpus

    cfg = config or CorpusPipelineConfig()
    if cfg.exact_tokens:
        raise ValueError(
            "materialize_training_corpus renders the proxy-tokenizer "
            "stream; with exact_tokens=True the placement uses real BPE "
            "counts -- materialize via corpus.assemble_packed_sequences"
        )
    if not cfg.persist_survivors:
        cfg = replace(cfg, persist_survivors=True)
    res = build_training_corpus(docs, benchmark, cfg)
    totals = write_packed_corpus(
        wh, res.survivors, name,
        seq_tokens=cfg.seq_tokens, seqs_per_shard=seqs_per_shard,
        id_col=cfg.id_col, text_col=cfg.text_col,
    )
    summary = res.summary()
    build = res.manifest(summary)
    spark = docs.sparkSession
    bdf = spark.createDataFrame(
        [(json.dumps(build), totals["tokens"], totals["sequences"],
          totals["shards"])],
        "build_manifest string, n_tokens long, n_sequences long, "
        "n_shards long",
    )
    bname = f"{name}.build"
    if not wh.exists(bname):
        wh.create_table(bname, bdf.schema)
    wh.overwrite(bname, bdf)
    return res, totals
