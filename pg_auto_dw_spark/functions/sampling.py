"""Deterministic stratified sampling.

Training-data pipelines sample per stratum (language, source, quality
band) with per-stratum rates -- e.g. downsample English to rebalance a
multilingual corpus. The operators here are *deterministic*: the keep
decision is a pure function of the row key, so a re-run (or a re-run
on a 100x bigger cluster with different partitioning) selects the same
rows -- the property `df.sample()` cannot give you, and the one that
makes sampled corpora reproducible and auditable.

The mechanism is a multiplicative-hash rank: ``rank(key) = (key *
2654435761) % 1_000_003`` (Knuth's 2^32/phi multiplier, prime
modulus). It is plain 64-bit integer arithmetic, so any engine
computes the identical rank -- which is exactly how the DuckDB oracles
verify these operators bit-for-bit. For string keys, hash first
(sha2 -> bigint) upstream.

Scale shape:
- ``stratified_sample`` (rate per stratum) is a pure narrow filter --
  zero shuffles, pushes into the scan's whole-stage codegen, perfectly
  parallel at any size. This is THE form for 100 TB sampling.
- ``stratified_fixed_n`` (exact n per stratum) needs a per-stratum
  top-n: rank + row_number over (stratum) -- one shuffle; a huge
  stratum concentrates in one task's sort. Spark's window TopK pushdown
  (rank<=n filter) keeps the sort bounded, but for pathological strata
  sizes prefer rate-based sampling with a rate that lands near n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MULTIPLIER = 2654435761  # Knuth multiplicative hash (2^32 / phi)
MODULUS = 1_000_003  # prime; rank in [0, MODULUS)


def sample_rank(key: Column) -> Column:
    """Deterministic pseudo-uniform rank in [0, MODULUS) -- exact
    integer arithmetic, reproducible across engines/partitionings."""
    return (key.cast("long") * F.lit(MULTIPLIER)) % F.lit(MODULUS)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    rates: dict[str, float],
    strata_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff ``rank(key) < rate(stratum) * MODULUS``.
    Rates are per-stratum keep probabilities; unlisted strata use
    ``default_rate``. Zero-shuffle, deterministic, order-independent."""
    threshold = F.lit(int(default_rate * MODULUS))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * MODULUS))
        ).otherwise(threshold)
    return df.filter(sample_rank(F.col(key_col)) < threshold)


def stratified_fixed_n(
    df: DataFrame,
    key_col: str,
    n: int | dict[str, int],
    strata_col: str,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: the n smallest
    ranks, ties broken by key (ranks collide only for keys congruent
    mod MODULUS, so the key tiebreak makes selection total and
    deterministic). One shuffle on the stratum.

    ``n`` may be a per-stratum dict -- the dataset-mixture form:
    target counts per source/language (unlisted strata get 0). For
    proportional targets compute the dict from a counts aggregation
    first (mixture design stays driver-side where it belongs; the
    selection stays distributed and deterministic)."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_rank(F.col(key_col)), F.col(key_col)
    )
    if isinstance(n, dict):
        limit = F.lit(0)
        for value, cnt in sorted(n.items()):
            limit = F.when(
                F.col(strata_col) == value, F.lit(int(cnt))
            ).otherwise(limit)
    else:
        limit = F.lit(int(n))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
        .drop("__rn")
    )


def temperature_mixture_plan(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    budget_rows: int | None = None,
) -> list[dict]:
    """Temperature-based mixture design over a stratum column (source,
    language, quality band): stratum weights proportional to
    ``count^alpha`` -- the multilingual/multi-source rebalancing rule
    (alpha=1 keeps natural proportions, alpha->0 approaches uniform,
    0.3-0.7 is the usual up-weight-the-tail band for training mixes).

    Returns the driver-side plan -- one dict per stratum with
    ``n_rows``, normalized ``weight``, and (when ``budget_rows`` is
    set) the ``target_n`` and keep ``rate`` that realize the mix within
    the budget. Rates cap at 1.0 (a stratum cannot be up-sampled past
    its population; the shortfall stays visible in the plan rather
    than being silently redistributed -- repeat-sampling is a separate,
    deliberate step). One map-side-combined count shuffle; the plan is
    strata-sized, which is what makes mixture DESIGN a driver concern
    and row SELECTION a distributed one.

    A NULL stratum (rows missing the source/language tag) is a real
    stratum here: it appears in the plan as ``stratum=None`` (sorted
    first) and gets its own weight/rate like any other -- dropping
    untagged rows is a cleaning decision, not a sampling side
    effect."""
    counts = sorted(
        (
            (r[strata_col], r["n"])
            for r in df.groupBy(strata_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ),
        key=lambda kv: (kv[0] is not None, kv[0]),
    )
    total_w = sum(n ** alpha for _, n in counts)
    plan = []
    for value, n in counts:
        w = (n ** alpha) / total_w
        row = {"stratum": value, "n_rows": n, "weight": w}
        if budget_rows is not None:
            target = w * budget_rows
            row["target_n"] = int(target)
            row["rate"] = min(1.0, target / n) if n else 0.0
        plan.append(row)
    return plan


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    budget_rows: int | None = None,
) -> DataFrame:
    """Deterministic temperature-mixture sample: design the per-stratum
    rates with ``temperature_mixture_plan`` (driver-side, strata-sized)
    and apply them as the zero-shuffle ``stratified_sample`` filter --
    the reproducible form of 'sample a training mix at temperature
    alpha within a row budget'. ``budget_rows`` is required and must be
    positive: without a budget every rate is 0 and the "sample" would
    be silently empty (r7 review finding). Rows with a NULL stratum are
    sampled at the NULL stratum's own planned rate (stratified_sample's
    CASE ladder can never equality-match NULL, so that rate rides the
    default slot -- safe because every non-null stratum is explicitly
    enumerated). Same determinism contract as every sampler here: the
    keep decision is a pure function of the row key, so re-runs and
    re-partitionings select identical rows."""
    if not budget_rows or budget_rows <= 0:
        raise ValueError("temperature_sample needs budget_rows >= 1")
    plan = temperature_mixture_plan(df, strata_col, alpha, budget_rows)
    rates = {
        row["stratum"]: row["rate"] for row in plan if row["stratum"] is not None
    }
    null_rate = next(
        (row["rate"] for row in plan if row["stratum"] is None), 0.0
    )
    return stratified_sample(df, key_col, rates, strata_col, default_rate=null_rate)


def repeat_sample(
    df: DataFrame,
    key_col: str,
    factors: dict[str, float],
    strata_col: str,
    default_factor: float = 1.0,
) -> DataFrame:
    """Deterministic repeat-sampling (epoch up-weighting): each row of
    stratum ``d`` appears ``floor(f_d)`` times, plus one more iff
    ``rank(key) < frac(f_d) * MODULUS`` -- so a stratum's realized row
    count is its population times ~f_d, exactly reproducible across
    runs and partitionings. This is the deliberate second step the
    ``temperature_mixture_plan`` rate cap points at: rates handle
    down-sampling; repeating past 1.0 (seeing a small high-value
    stratum for multiple "epochs", the standard up-weighting move for
    curated corpora) is THIS operator, kept separate so duplication is
    never a silent sampling side effect.

    Output adds ``copy_id`` (1..n for a row's copies) so downstream
    keys can stay unique (e.g. packing or shuffling the repeated
    corpus). Factor 0 drops the stratum; factors must be >= 0. A NULL
    stratum follows ``default_factor`` (the CASE ladder can never
    equality-match NULL). Zero shuffles: explode of a per-row bounded
    sequence, fused into the scan."""
    for value, f in factors.items():
        if f < 0:
            raise ValueError(f"negative repeat factor for {value!r}: {f}")
    if default_factor < 0:
        raise ValueError(f"negative default_factor: {default_factor}")

    def parts(f: float) -> tuple[int, int]:
        base = int(f)
        return base, int(round((f - base) * MODULUS))

    base_d, frac_d = parts(default_factor)
    base_col, frac_col = F.lit(base_d), F.lit(frac_d)
    for value, f in sorted(factors.items()):
        b, fr = parts(f)
        cond = F.col(strata_col) == value
        base_col = F.when(cond, F.lit(b)).otherwise(base_col)
        frac_col = F.when(cond, F.lit(fr)).otherwise(frac_col)
    n_copies = base_col + (sample_rank(F.col(key_col)) < frac_col).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") >= 1)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def quality_bin(score: Column, thresholds: list[float]) -> Column:
    """BIGINT quality-bin index of a score: the number of thresholds
    at or below it (bin 0 = below every threshold, bin len(thresholds)
    = at/above all). Thresholds are FIXED cut points chosen by the
    caller (from a one-off quantile sketch, a rubric, a classifier
    calibration) -- fixed cuts keep binning a pure zero-shuffle map and
    make the bin cross-engine exact, where quantile-derived bins would
    couple every row's bin to a global sort."""
    if not thresholds:
        raise ValueError("quality_bin needs at least one threshold")
    if sorted(thresholds) != list(thresholds):
        raise ValueError("thresholds must be ascending")
    b = F.lit(0)
    for t in thresholds:
        b = b + F.when(score >= F.lit(float(t)), F.lit(1)).otherwise(F.lit(0))
    return b.cast("bigint")


def quality_binned_sample(
    df: DataFrame,
    key_col: str,
    score_col: str,
    thresholds: list[float],
    rates: list[float],
    bin_col: str | None = "quality_bin",
) -> DataFrame:
    """Quality-curriculum mixture: keep each row with the per-bin rate
    of its quality bin (``rates[i]`` for bin i, so len(rates) ==
    len(thresholds) + 1) -- the standard "sample low-quality text at
    10%, keep high-quality at 100%" corpus recipe (the quality-band
    twin of source-temperature mixing). Deterministic multiplicative-
    hash rank like every sampler here; zero shuffles -- binning and the
    keep decision both push into the scan. Rows with a NULL score are
    DROPPED (a row with no quality signal has no bin; score docs
    first). ``bin_col`` (None disables) emits the bin for downstream
    curriculum ordering (see shard.write_curriculum_shards)."""
    if len(rates) != len(thresholds) + 1:
        raise ValueError(
            f"need len(thresholds) + 1 = {len(thresholds) + 1} rates, "
            f"got {len(rates)}"
        )
    for r in rates:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rates must be in [0, 1], got {r}")
    b = quality_bin(F.col(score_col), thresholds)
    cutoffs = F.array(*[F.lit(int(r * MODULUS)) for r in rates])
    out = df.filter(
        F.col(score_col).isNotNull()
        & (sample_rank(F.col(key_col)) < F.element_at(cutoffs, (b + 1).cast("int")))
    )
    if bin_col is not None:
        out = out.withColumn(bin_col, b)
    return out


def doremi_domain_weights(
    losses: DataFrame,
    domain_col: str = "domain",
    proxy_col: str = "proxy_loss",
    ref_col: str = "ref_loss",
    prior_col: str | None = None,
    lr: float = 1.0,
    smoothing: float = 0.0,
) -> DataFrame:
    """One exponentiated-gradient step of DoReMi domain reweighting
    (Xie et al. 2023, arXiv:2305.10429): given per-domain proxy-model
    and reference-model losses, up-weight the domains where the proxy
    is furthest BEHIND the reference (excess loss = max(proxy - ref,
    0) -- the domains with the most learnable headroom), normalize,
    and mix with uniform smoothing. The output weights drive the next
    mixture round (``stratified_sample`` rates or
    ``temperature_mixture_plan`` budgets); iterating
    train-proxy -> reweight -> resample is the DoReMi loop.

    weight_i = (1 - smoothing) * p_i * exp(lr * excess_i) / Z
               + smoothing / n_domains
    with p_i the prior (``prior_col``, default uniform) and Z the
    normalizer.

    Input is DOMAIN-grain (bounded at the domain count -- mixture
    design is driver-scale by nature, same as
    temperature_mixture_plan), so the two unpartitioned window
    aggregates here are over tens of rows, not data. Output:
    (domain, excess_loss, weight), weights summing to 1."""
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0, 1], got {smoothing}")
    if lr < 0:
        raise ValueError(f"lr must be >= 0, got {lr}")
    excess = F.greatest(F.col(proxy_col) - F.col(ref_col), F.lit(0.0))
    prior = F.col(prior_col) if prior_col else F.lit(1.0)
    raw = prior * F.exp(F.lit(lr) * excess)
    everything = Window.partitionBy()
    norm = raw / F.sum(raw).over(everything)
    weight = (
        F.lit(1.0 - smoothing) * norm
        + F.lit(smoothing) / F.count(F.lit(1)).over(everything)
    )
    return losses.select(
        F.col(domain_col).alias("domain"),
        excess.alias("excess_loss"),
        weight.alias("weight"),
    )
