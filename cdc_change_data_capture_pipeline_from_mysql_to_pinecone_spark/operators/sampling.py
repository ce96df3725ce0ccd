"""Deterministic sampling / dataset-split operators for training-data
pipelines (north star: BASELINE.json "LLM-data-pipeline operators").

Every operator here is *hash-deterministic*, not RNG-based: the
assignment of a row to a split/sample/fold depends only on its key and
the seed, never on partitioning, task retries, or row order. That is
the property a 100 TB training pipeline actually needs — re-running the
job, adding executors, or re-shuffling inputs must not move documents
between train and test. Spark's built-in ``df.sample``/``randomSplit``
are seed-stable only for a fixed partitioning and are therefore not
reproducible under repartition; these operators are.

Built on ``functions.hashing.seeded_hash64`` (md5-derived, engine
portable), so a DuckDB/ANSI oracle can reproduce every assignment
bit-for-bit — the splits are *auditable* outside Spark.

All operators are narrow (no shuffle): a projection + filter over the
scan, so they pushdown-compose with downstream ops for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.hashing import (
    seeded_hash64,
)

BUCKETS = 10_000  # split resolution: 0.01% granularity


def _bucket(key: Column, seed: int) -> Column:
    """Deterministic bucket in [0, BUCKETS) for a key column."""
    return seeded_hash64(key.cast("string"), seed) % BUCKETS


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hashed
    key. Fractions must sum to <= 1.0; any remainder falls into the
    last split. Narrow op — no shuffle, no RNG.
    """
    total = sum(fractions.values())
    if not 0.0 < total <= 1.0 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    b = _bucket(F.col(key_col), seed)
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cond = b < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (e.g. language
    rebalancing of a document corpus). A row survives iff its hash
    bucket falls below its stratum's rate. Equivalent in expectation to
    ``df.sampleBy`` but reproducible under repartition and re-runs.
    """
    b = _bucket(F.col(key_col), seed)
    thresh = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == stratum
        lim = F.lit(int(round(rate * BUCKETS)))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    thresh = (
        F.lit(int(round(default_rate * BUCKETS)))
        if thresh is None
        else thresh.otherwise(int(round(default_rate * BUCKETS)))
    )
    return df.filter(b < thresh)


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int,
    seed: int = 42,
    fold_col: str = "fold",
) -> DataFrame:
    """Assign each row a cross-validation fold id in [0, k) by hashed
    key — stable across runs and partitionings."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn(
        fold_col, (_bucket(F.col(key_col), seed) % k).cast("long")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass data-profiling: per column, row/non-null/distinct
    counts and min/max (stringified so heterogeneous column types share
    one output schema). One aggregate over one scan regardless of how
    many columns are profiled — at 100 TB the table is read once, with
    only a 1-row-per-column result crossing the final exchange.
    (``count_distinct`` over many columns expands rows map-side; for
    very wide profiles swap in ``approx_count_distinct`` — same shape.)
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            F.count_distinct(c).alias(f"{c}__n_distinct"),
            F.min(c).cast("string").alias(f"{c}__min_val"),
            F.max(c).cast("string").alias(f"{c}__max_val"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n_rows`, `{c}__n_nonnull`, `{c}__n_distinct`, "
        f"`{c}__min_val`, `{c}__max_val`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_nonnull, n_distinct, min_val, max_val)"
        )
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    components: DataFrame,
    fractions: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
    label_col: str = "cluster_label",
    component_id_col: str = "id",
    component_col: str = "component",
) -> DataFrame:
    """Split by near-dup CLUSTER, not by row: every member of a cluster
    (from dedup.connected_components over LSH candidate pairs) hashes
    into the same split, so the test set cannot contain near-copies of
    training rows — the contamination channel a plain per-row
    hash_split leaves open. Unpaired rows are their own singleton
    cluster (label = own id). Same determinism properties as
    hash_split: no RNG, stable under repartition; the only extra cost
    is the label join (one shuffle on the id).

    ``component_id_col``/``component_col`` name the columns of
    ``components`` (defaulting to connected_components' output); they
    are re-aliased internally so a caller ``df`` that itself has ``id``
    or ``component`` columns is never shadowed or dropped (ADVICE r4).
    """
    comp = components.select(
        F.col(component_id_col).alias("__lss_id"),
        F.col(component_col).alias("__lss_component"),
    )
    joined = df.join(comp, df[id_col] == comp["__lss_id"], "left")
    labeled = joined.withColumn(
        label_col, F.coalesce(F.col("__lss_component"), df[id_col])
    ).drop("__lss_id", "__lss_component")
    return hash_split(labeled, label_col, fractions, seed, split_col)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    targets: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Corpus MIXTURE sampler — the data-mixing step of a pretraining
    pipeline: given target output PROPORTIONS per source (e.g. web
    0.6 / code 0.2 / books 0.2), down-sample each source so the output
    matches the mixture at the LARGEST size the corpus allows without
    replication. The binding source is the one with the worst
    availability-to-target ratio: output size N = min_s(n_s / t_s)
    (its keep-rate is exactly 1.0), every other source keeps
    t_s * N / n_s of its rows. This differs from
    :func:`stratified_sample` (caller supplies per-stratum RATES) in
    that the rates are DERIVED from the corpus's own counts and the
    target mixture — the knob a data-recipe owner actually holds.

    Sources absent from ``targets`` are dropped (weight 0). Rows keep
    or drop by hashed key like every operator here — deterministic
    under repartition/retry, oracle-reproducible.

    Shape for 100 TB: one map-side-combined count per source (output =
    #sources rows), a 1-row min aggregate, a broadcast join of the
    per-source rate back onto the corpus, then the narrow hash filter
    — no collect, no RNG, and the scan pipelines into the filter."""
    total = sum(targets.values())
    if total <= 0:
        raise ValueError("targets must have positive total weight")
    norm = {s: t / total for s, t in targets.items()}
    tmap = F.create_map(*[F.lit(x) for st in norm.items() for x in st])
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_t", tmap[F.col(source_col)])
        .filter(F.col("_t").isNotNull())
    )
    # N = min over sources of n/t; rate_s = (t_s * N) / n_s  (<= 1,
    # == 1 at the binding source). Same expression shape as the SQL
    # oracle so both engines compute identical doubles.
    lim = counts.agg(F.min(F.col("_n") / F.col("_t")).alias("_cap"))
    rates = counts.crossJoin(F.broadcast(lim)).select(
        F.col(source_col),
        ((F.col("_t") * F.col("_cap")) / F.col("_n")).alias("_rate"),
    )
    b = _bucket(F.col(key_col), seed)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(b.cast("double") < F.col("_rate") * BUCKETS)
        .drop("_rate")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-Res): each row gets priority ln(u)/w where
    u is a hash-uniform in (0,1) derived from the key and seed, and
    the top-k priorities win — inclusion odds scale with weight, and
    the monotone ln transform selects exactly the classic u^(1/w)
    keys without the extra pow. Like every operator in this module
    the draw depends only on (key, seed) — repartition, retries, and
    engine never move a row in or out of the sample, and an external
    SQL oracle reproduces the selection.

    With ``strata``, top-k per stratum via a ranking window
    partitioned on the strata (parallel, k survivors per group — the
    per-language / per-source quota draw); without, a global top-k
    (TakeOrderedAndProject, no full sort). Weights must be > 0."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.functions.hashing import (
        MERSENNE31,
    )

    u = (
        (seeded_hash64(F.col(key_col).cast("string"), seed) % MERSENNE31 + 1).cast("double")
        / F.lit(float(MERSENNE31 + 1))
    )
    prio = F.log(u) / F.col(weight_col)
    if strata:
        from pyspark.sql import Window

        w = Window.partitionBy(*strata).orderBy(F.desc("_prio"), F.col(key_col))
        return (
            df.withColumn("_prio", prio)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_prio", "_rn")
        )
    return (
        df.withColumn("_prio", prio)
        .orderBy(F.desc("_prio"), F.col(key_col))
        .limit(k)
        .drop("_prio")
    )


def alpha_sampling(
    df: DataFrame,
    source_col: str,
    size_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled source sampling distribution — the
    multilingual-pretraining *alpha-sampling* recipe (mBERT's
    exponentially-smoothed weighting; XLM-R, Conneau et al. 2020 §3.1;
    the same knob as the Pile's per-set epochs, Gao et al. 2021):
    given per-row sizes (token counts), each source's natural share
    p_s = n_s / N is flattened to the target share
    q_s = p_s^alpha / sum_t p_t^alpha, and ``sample_factor`` = q_s/p_s
    is the implied up/down-sampling (expected epochs over that source
    at an N-token output budget). alpha=1 reproduces natural
    proportions, alpha=0 uniform; 0.3 is the published XLM-R setting.

    This complements :func:`mixture_sample`: there the recipe owner
    states target proportions and the operator derives keep-rates;
    here the corpus's own distribution plus one temperature knob
    derives the targets themselves.

    Shape for 100 TB: ONE map-side-combined sum per source (output =
    #sources rows); everything downstream is arithmetic on that tiny
    frame plus two 1-row broadcast aggregates — no second pass over
    the corpus, no collect, no RNG. p^alpha is spelled
    exp(alpha * ln p) so an external SQL oracle lines up libm-for-libm
    (both engines then agree to ~1 ulp; callers round for hashing).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    per = df.groupBy(source_col).agg(F.sum(F.col(size_col)).alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").alias("_total"))
    p = F.col("n_tokens").cast("double") / F.col("_total").cast("double")
    pw = per.crossJoin(F.broadcast(tot)).select(
        F.col(source_col),
        F.col("n_tokens"),
        p.alias("_p"),
        F.exp(F.lit(float(alpha)) * F.log(p)).alias("_pa"),
        F.col("_total"),
    )
    z = pw.agg(F.sum("_pa").alias("_z"))
    q = F.col("_pa") / F.col("_z")
    return pw.crossJoin(F.broadcast(z)).select(
        F.col(source_col),
        F.col("n_tokens"),
        F.col("_p").alias("p_natural"),
        q.alias("q_alpha"),
        (q / F.col("_p")).alias("sample_factor"),
        (q * F.col("_total").cast("double")).alias("expected_tokens"),
    )
