"""Incremental aggregate maintenance — the CDC payoff operator.

The reference's whole point is processing only deltas (SURVEY §4
"incremental computation"); this module extends that from *ingestion*
to *analytics*: a stored rollup (grouped sums/counts/mins/maxes) is
updated from each watermark delta by merging mergeable partial states,
so refreshing a 100 TB-table dashboard costs O(delta), not O(table).

Only algebraic aggregates are supported (sum/count/min/max, and avg
derived as sum/count) — exactly the class that admits partial merge.
Holistic aggregates (exact percentile, distinct) need sketches; that
is what `approx_count_distinct`'s HLL state would back at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_rollup(delta: DataFrame, keys: list[str], measures: dict[str, str]) -> DataFrame:
    """Aggregate one watermark delta into partial state rows.

    ``measures`` maps column -> one of sum|count|min|max. Output
    columns: ``<agg>_<col>`` plus ``rollup_rows`` (count of delta rows
    folded in, for avg and for auditing).
    """
    aggs = [F.count(F.lit(1)).alias("rollup_rows")]
    for col, how in measures.items():
        if how == "sum":
            aggs.append(F.sum(col).alias(f"sum_{col}"))
        elif how == "count":
            aggs.append(F.count(col).alias(f"count_{col}"))
        elif how == "min":
            aggs.append(F.min(col).alias(f"min_{col}"))
        elif how == "max":
            aggs.append(F.max(col).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-algebraic aggregate {how!r} cannot merge incrementally")
    return delta.groupBy(*keys).agg(*aggs)


def merge_rollups(stored: DataFrame, update: DataFrame, keys: list[str], measures: dict[str, str]) -> DataFrame:
    """Merge a delta's partial state into the stored rollup: union the
    two partial-state tables and re-reduce with the measures' own
    merge functions (sum+sum, min(min), max(max)). One shuffle on the
    grouping keys, state-sized — never touches base data."""
    merged = stored.unionByName(update, allowMissingColumns=True)
    aggs = [F.sum("rollup_rows").alias("rollup_rows")]
    for col, how in measures.items():
        if how in ("sum", "count"):
            aggs.append(F.sum(f"{how}_{col}").alias(f"{how}_{col}"))
        elif how == "min":
            aggs.append(F.min(f"min_{col}").alias(f"min_{col}"))
        elif how == "max":
            aggs.append(F.max(f"max_{col}").alias(f"max_{col}"))
    return merged.groupBy(*keys).agg(*aggs)


def delta_join(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Rows ADDED to an equi-join by one CDC tick, computed from the
    deltas — never by re-joining the bases:

        ΔJ = ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB

    (the ΔA⋈ΔB cross term rides in the first leg, so nothing double
    counts). Exact for append-only streams — the reference's model
    (watermark strictly advances, rows never retract; SURVEY §4); with
    updates, feed the upstream through ``snapshot_latest`` first and
    process retractions separately.

    Cost is O(|ΔA| + |ΔB|) probe-side: each leg joins a tick-sized
    delta against one base, so Catalyst broadcasts the delta and the
    base is never shuffled — refreshing a stored 100 TB join costs the
    tick, not the table. Verified against the semantic truth
    (J_new EXCEPT ALL J_old) by the oracle, not against its own
    formula."""
    b_new = b_old.unionByName(delta_b)
    return delta_a.join(b_new, on).unionByName(a_old.join(delta_b, on))


def delta_passage_rollup(
    delta: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Incremental maintenance for the exact-substring-dedup blocklist
    (the r14/r15 pair text.duplicated_passages / text.
    apply_passage_blocklist): fold one CDC delta of NEW documents into
    passage state (passage, n_docs, first_doc). The state keeps
    SINGLETON passages on purpose — a passage seen once is not yet
    blocklisted, but a later delta may bring its second carrier, and a
    state that pre-filtered at min_docs would lose exactly the
    cross-tick duplicates the blocklist exists to catch (unit-tested:
    a pair straddling two ticks).

    Contract: deltas PARTITION the corpus (append-only CDC — each doc
    id arrives in exactly one delta). n_docs sums across merges under
    that contract; min(first_doc) merges unconditionally.

    Scale shape: identical to the one-shot builder per delta (explode
    per-doc DISTINCT grams -> ONE map-side-combined hash agg). State
    is the corpus's distinct-gram table — inherently linear in corpus
    size (exact passage dedup cannot be sub-linear; the paper's
    suffix array is too), but refreshing it costs O(delta grams) +
    one state-sized merge shuffle, never a corpus re-read."""
    from .text import duplicated_passages

    return duplicated_passages(delta, id_col, text_col, n=n, min_docs=1)


def merge_passage_rollups(stored: DataFrame, update: DataFrame) -> DataFrame:
    """Merge passage-blocklist states: union + re-reduce (sum of
    carrier counts — exact under the partitioned-delta contract —
    and min of exemplar ids). One state-sized shuffle on the passage
    hash; base documents never touched."""
    merged = stored.unionByName(update)
    return merged.groupBy("passage").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.min("first_doc").cast("long").alias("first_doc"),
    )


def passage_blocklist(state: DataFrame, min_docs: int = 2) -> DataFrame:
    """Read-time view of the maintained state: the passages currently
    carried by >= ``min_docs`` documents — byte-identical to running
    text.duplicated_passages one-shot over everything folded so far
    (the merge-order-free invariant the registry oracle pins)."""
    return state.filter(F.col("n_docs") >= min_docs)


def delta_distinct_rollup(
    delta: DataFrame, keys: list[str], distinct_cols: list[str], lg_k: int = 12
) -> DataFrame:
    """Sketch the delta for incremental DISTINCT counting — the
    holistic aggregate the algebraic rollup above cannot maintain.
    Each (keys, col) group folds into a Datasketches HLL sketch
    (``hll_sketch_agg``); output columns ``hll_<col>`` hold binary
    sketch state, mergeable forever after.

    HLL registers combine by per-register MAX, so merge order never
    matters: a chain of tick-merges yields the SAME estimate as one
    sketch over all data (exact equality, tested) — that is what makes
    the distinct count maintainable from deltas at all. State is
    2^lg_k registers per group regardless of data size; error ~1.04 /
    sqrt(2^lg_k) (~1.6% at the default)."""
    aggs = [F.count(F.lit(1)).alias("rollup_rows")]
    for col in distinct_cols:
        aggs.append(F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(f"hll_{col}"))
    return delta.groupBy(*keys).agg(*aggs)


def merge_distinct_rollups(
    stored: DataFrame, update: DataFrame, keys: list[str], distinct_cols: list[str]
) -> DataFrame:
    """Merge sketch states (``hll_union_agg`` — per-register max) and
    keep them mergeable; estimate at read time via
    :func:`estimate_distinct`. One state-sized shuffle, base data
    never touched — same contract as :func:`merge_rollups`."""
    merged = stored.unionByName(update, allowMissingColumns=True)
    aggs = [F.sum("rollup_rows").alias("rollup_rows")]
    for col in distinct_cols:
        aggs.append(F.hll_union_agg(F.col(f"hll_{col}")).alias(f"hll_{col}"))
    return merged.groupBy(*keys).agg(*aggs)


def estimate_distinct(rollup: DataFrame, distinct_cols: list[str]) -> DataFrame:
    """Read-time view: replace each binary sketch column with its
    cardinality estimate (``nd_<col>``)."""
    out = rollup
    for col in distinct_cols:
        out = out.withColumn(f"nd_{col}", F.hll_sketch_estimate(f"hll_{col}")).drop(f"hll_{col}")
    return out


def changelog_delta_rollup(
    changelog: DataFrame,
    keys: list[str],
    measures: dict[str, str],
    op_col: str = "op",
    before_prefix: str = "before_",
    after_prefix: str = "after_",
) -> DataFrame:
    """Net effect of one changelog tick on a stored rollup — the
    retractable extension of :func:`delta_rollup` (which is
    append-only). Rows carry ``op`` in {'I','U','D'} with the measure
    columns doubled as ``before_<col>`` (U/D: the value the base
    currently holds) and ``after_<col>`` (I/U: the new value), the
    standard CDC before/after image (Debezium/Delta CDF shape).

    Multiplicity algebra (incremental view maintenance): an insert
    contributes (+1, +after), a delete (-1, -before), an update
    (0, after - before). The output uses delta_rollup's column names,
    so :func:`merge_rollups` folds it into stored state unchanged —
    a 100 TB dashboard stays exact under source-side DELETEs and
    UPDATEs for the cost of the tick.

    Only sum/count are retractable: a deleted MIN/MAX invalidates the
    stored extreme in a way no O(state) merge can repair (the classic
    IVM result — repair needs a per-key rescan or a mergeable
    quantile/heap sketch), so those measures raise here."""
    op = F.col(op_col)
    d_rows = F.when(op == "I", F.lit(1)).when(op == "D", F.lit(-1)).otherwise(F.lit(0))
    aggs = [F.sum(d_rows).alias("rollup_rows")]
    for col, how in measures.items():
        before, after = F.col(f"{before_prefix}{col}"), F.col(f"{after_prefix}{col}")
        if how == "sum":
            # NULL-transition safety: an update that sets the measure
            # to NULL must retract the old value (and NULL -> v must
            # add v); a bare after - before would be NULL and F.sum
            # would silently drop the retraction
            b0, a0 = F.coalesce(before, F.lit(0)), F.coalesce(after, F.lit(0))
            delta = (
                F.when(op == "I", a0)
                .when(op == "D", -b0)
                .otherwise(a0 - b0)
            )
            aggs.append(F.sum(delta).alias(f"sum_{col}"))
        elif how == "count":
            nn = lambda c: c.isNotNull().cast("long")  # noqa: E731
            delta = (
                F.when(op == "I", nn(after))
                .when(op == "D", -nn(before))
                .otherwise(nn(after) - nn(before))
            )
            aggs.append(F.sum(delta).alias(f"count_{col}"))
        else:
            raise ValueError(
                f"measure {how!r} is not retractable: deletes invalidate stored "
                "min/max — recompute the key group or maintain a mergeable sketch"
            )
    return changelog.groupBy(*keys).agg(*aggs)


def delta_minhash_rollup(
    delta: DataFrame,
    keys: list[str],
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-key MinHash SKETCH state from one tick — the similarity
    counterpart of the HLL distinct rollup: each key group (source,
    domain, shard) keeps the k component-mins of its pooled shingle
    set. MIN is order-free and idempotent exactly like HLL's
    per-register max, so tick-chained merges equal a single-shot
    sketch EXACTLY (not approximately) — that is what makes a
    corpus-wide similarity index maintainable from CDC deltas: pairwise
    key-group resemblance (estimated Jaccard of their shingle sets =
    fraction of agreeing components) stays queryable at any point
    without ever rescanning old documents. Output columns ``mh0..mh{k-1}``
    plus ``rollup_rows``."""
    from ..functions.hashing import MERSENNE31, universal_coeffs
    from .dedup import shingle_hash_rows

    exploded = shingle_hash_rows(delta, text_col, keys, shingle_n)
    aggs = [
        F.expr(f"min(({a} * _h + {b}) % {MERSENNE31})").alias(f"mh{i}")
        for i, (a, b) in enumerate(universal_coeffs(num_hashes))
    ]
    counts = delta.groupBy(*keys).agg(F.count(F.lit(1)).alias("rollup_rows"))
    # counts drive the join: a tick whose rows for a key are all
    # NULL-text produces zero shingles (no sketch row), but the key's
    # row count must still reach the merged state (mh components stay
    # NULL; merge's MIN skips them)
    return counts.join(exploded.groupBy(*keys).agg(*aggs), keys, "left")


def merge_minhash_rollups(
    stored: DataFrame, update: DataFrame, keys: list[str], num_hashes: int = 16
) -> DataFrame:
    """Merge sketch states: component-wise MIN per key (plus row
    counts) — one state-sized shuffle, order-free, base data never
    re-read. Same contract as merge_distinct_rollups."""
    merged = stored.unionByName(update, allowMissingColumns=True)
    aggs = [F.min(f"mh{i}").alias(f"mh{i}") for i in range(num_hashes)]
    aggs.append(F.sum("rollup_rows").alias("rollup_rows"))
    return merged.groupBy(*keys).agg(*aggs)


def estimate_resemblance(
    rollup: DataFrame, key: str, num_hashes: int = 16, max_groups: int = 10_000
) -> DataFrame:
    """Pairwise estimated Jaccard between key groups from their
    sketches: fraction of agreeing MinHash components. O(groups²)
    pairs of O(k)-wide states — groups are domains/shards (thousands),
    never documents, so the cross join is on the TINY state table.

    ``max_groups`` is a fail-fast guard for that contract: a call
    mis-keyed on a document-grained column would silently queue a
    quadratic cross join; instead we count groups with an early-out
    ``limit(n+1).count()`` scan and raise with guidance. COST: the
    guard EXECUTES the upstream plan once at call time — for a state
    table that is the product of a chained rollup, that means running
    the chain twice (or at plan-build time, if the caller builds
    lazily). When the key's cardinality is known-small by
    construction, pass ``None`` (as the registry's lang-keyed caller
    does); when the chain is expensive and the guard still wanted,
    ``persist()`` the rollup first. The default stays ON because the
    failure it prevents — an unbounded cross join on a mis-keyed
    call — is strictly worse than a duplicated scan.

    Agreement is null-safe: a group whose rows all had NULL/empty text
    carries NULL sketch components, and ``==`` would propagate NULL
    through the agree sum, nulling est_jaccard for every pair touching
    that group. A NULL component matches nothing — including another
    NULL (no evidence is not shared evidence) — so each term is
    both-not-null AND equal."""
    if max_groups is not None:
        n = rollup.limit(max_groups + 1).count()
        if n > max_groups:
            raise ValueError(
                f"estimate_resemblance: state table has >{max_groups} groups; "
                f"the pairwise cross join is O(groups^2) and is meant for "
                f"domain/shard-grained keys, not '{key}' at this cardinality. "
                f"Re-key the rollup coarser, or pass max_groups=None/higher "
                f"to accept the quadratic cost."
            )
    a = rollup.select(F.col(key).alias("key_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_hashes)])
    b = rollup.select(F.col(key).alias("key_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(num_hashes)])
    agree = sum(
        (
            F.col(f"a{i}").isNotNull()
            & F.col(f"b{i}").isNotNull()
            & (F.col(f"a{i}") == F.col(f"b{i}"))
        ).cast("int")
        for i in range(num_hashes)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", (agree / F.lit(num_hashes)).alias("est_jaccard"))
    )


def _mg_reduce(counts: DataFrame, keys: list[str], item_col: str, k: int) -> DataFrame:
    """Reduce exact (keys..., item, cnt) rows to a k-counter
    Misra-Gries summary per key group: rank items by (cnt DESC, item),
    subtract the (k+1)-th count from the top k, drop non-positive.
    Deterministic — the cross-engine contract an SQL oracle replays
    exactly. MG guarantee: every true frequency f is bounded by
    summary_cnt <= f <= summary_cnt + (dropped mass / k)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col("cnt").desc(), F.col(item_col))
    wk = Window.partitionBy(*keys)
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    ck1 = F.max(F.when(F.col("_rn") == k + 1, F.col("cnt")).otherwise(F.lit(0))).over(wk)
    return (
        ranked.withColumn("_ck1", ck1)
        .filter((F.col("_rn") <= k) & (F.col("cnt") - F.col("_ck1") > 0))
        .select(*keys, item_col, (F.col("cnt") - F.col("_ck1")).alias("cnt"))
    )


def delta_topk_rollup(
    delta: DataFrame, keys: list[str], item_col: str, k: int = 3
) -> DataFrame:
    """Per-key-group HEAVY-HITTERS sketch state from one tick — the
    frequent-items member of the maintained-rollup family (HLL =
    distinct count, MinHash = similarity, this = top items): a
    k-counter Misra-Gries summary of item frequencies, mergeable by
    count addition + re-reduction, so the per-source "what dominates
    this feed" question stays answerable from CDC deltas without
    rescanning history. Output: (keys..., item, cnt) with at most k
    rows per key group; ``cnt`` is a LOWER bound on the true
    frequency (within dropped-mass/k of exact — the MG guarantee).

    Scale shape: one exact (key, item)-grained count aggregate
    (map-side combining) then a rank window over each key group's
    distinct items. The summary construction is deterministic (rank
    by count desc, item) so an external SQL oracle replays the exact
    tick-and-merge sequence — approximation with a reproducible
    contract, like the HLL rollup's fixed register layout."""
    counts = delta.groupBy(*keys, item_col).agg(F.count(F.lit(1)).alias("cnt"))
    return _mg_reduce(counts, keys, item_col, k)


def merge_topk_rollups(
    stored: DataFrame, update: DataFrame, keys: list[str], item_col: str, k: int = 3
) -> DataFrame:
    """Merge two Misra-Gries summaries: add counts for common items,
    then re-reduce to k counters. Associative and order-insensitive
    in its error BOUND (each merge adds at most the dropped mass/k);
    the reduction rule is deterministic, so any fixed merge order is
    exactly replayable by the oracle."""
    merged = (
        stored.unionByName(update)
        .groupBy(*keys, item_col)
        .agg(F.sum("cnt").alias("cnt"))
    )
    return _mg_reduce(merged, keys, item_col, k)


def delta_theta_rollup(
    delta: DataFrame, keys: list[str], value_col: str, lg_k: int = 15
) -> DataFrame:
    """Per-key THETA sketch of distinct ``value_col`` from one tick —
    the SET-OPERATION member of the maintained-distinct family. HLL
    (delta_distinct_rollup) answers only "how many distinct"; theta
    sketches additionally support intersection and difference, so the
    stored states answer audience-OVERLAP questions — distinct users
    in BOTH segments, churn between ticks — without rescanning base
    data (Datasketches theta, the standard warehouse overlap sketch).

    Same merge contract as the HLL rollup: union is order-free and
    idempotent, so chained tick-merges equal the single-shot sketch
    exactly. Below 2^lg_k distinct values per group the sketch
    retains every hash and estimates are EXACT (the fixture-parity
    regime, and why the oracle can be plain SQL); beyond, relative
    error ~1/sqrt(2^lg_k) — the trade a 100 TB segment table happily
    makes. Output: ``theta_<col>`` binary state + ``rollup_rows``."""
    return delta.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("rollup_rows"),
        F.theta_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(f"theta_{value_col}"),
    )


def merge_theta_rollups(
    stored: DataFrame, update: DataFrame, keys: list[str], value_col: str, lg_k: int = 15
) -> DataFrame:
    """Merge theta states (``theta_union_agg``) keeping them
    mergeable; one state-sized shuffle, base data never re-read.

    ``lg_k`` MUST match the sketches' own (delta_theta_rollup's):
    Spark's theta_union_agg defaults to lgNomEntries=12, which would
    silently DOWNSAMPLE lg_k=15 states to 4096 entries and break the
    exact-below-capacity contract (review catch: a 6000-distinct
    segment estimated 5918 after a default-union merge while the
    single-shot sketch was exact)."""
    merged = stored.unionByName(update, allowMissingColumns=True)
    return merged.groupBy(*keys).agg(
        F.sum("rollup_rows").alias("rollup_rows"),
        F.theta_union_agg(F.col(f"theta_{value_col}"), F.lit(lg_k)).alias(
            f"theta_{value_col}"
        ),
    )


def estimate_group_overlap(
    rollup: DataFrame,
    key: str,
    value_col: str,
    max_groups: int = 10_000,
    lg_k: int = 15,
) -> DataFrame:
    """Pairwise distinct-set overlap between key groups from their
    theta states alone: |A|, |B|, |A∩B|, |A∪B| and Jaccard per
    (key_a < key_b) pair — the query HLL states cannot answer.
    O(groups²) pairs over the TINY state table, with the same
    fail-fast ``max_groups`` ceiling (and upstream-execution cost
    caveat) as estimate_resemblance. ``lg_k`` must match the states'
    — the pairwise theta_union otherwise downsamples to its
    4096-entry default and nd_or/jaccard lose the exact-below-
    capacity guarantee (review catch; theta_intersection never
    downsamples and takes no size)."""
    if max_groups is not None:
        n = rollup.limit(max_groups + 1).count()
        if n > max_groups:
            raise ValueError(
                f"estimate_group_overlap: state table has >{max_groups} groups; "
                f"the pairwise cross join is O(groups^2) — re-key coarser or "
                f"pass max_groups=None/higher to accept the quadratic cost."
            )
    th = f"theta_{value_col}"
    a = rollup.select(F.col(key).alias("key_a"), F.col(th).alias("_ta"))
    b = rollup.select(F.col(key).alias("key_b"), F.col(th).alias("_tb"))
    inter = F.theta_sketch_estimate(F.theta_intersection(F.col("_ta"), F.col("_tb")))
    union = F.theta_sketch_estimate(
        F.theta_union(F.col("_ta"), F.col("_tb"), F.lit(lg_k))
    )
    return (
        a.crossJoin(b)
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.theta_sketch_estimate(F.col("_ta")).alias("nd_a"),
            F.theta_sketch_estimate(F.col("_tb")).alias("nd_b"),
            inter.alias("nd_and"),
            union.alias("nd_or"),
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
    )


def delta_ivf_assign(
    delta: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    version_col: str,
) -> DataFrame:
    """IVF cell assignment of a CDC DELTA — the vector-index member of
    the maintained-state family (VERDICT r6 task 6). Quantizes only
    the tick's new/updated vectors against the FIXED centroid set
    (operators.vectors.ivf_assign: per-row argmax, no shuffle, the
    broadcast path above ~64 centroids) and keeps ``version_col`` so
    the merge can last-writer-wins per id. The centroids must stay
    fixed across ticks — retraining them is an index REBUILD, not a
    tick (same contract a hosted ANN index has: incremental upserts
    against a trained quantizer, periodic re-train offline).

    State is one row per vector id: (id, cell, version) — O(corpus),
    but ~16 bytes of payload per vector, not the vector itself; the
    maintained cell map is exactly what ivf_topk's probe filter needs,
    so a CDC tick keeps ANN search fresh without re-quantizing the
    corpus (≙ the reference's per-sweep index.upsert keeping Pinecone
    current, service.py:151-166, in maintained rather than
    full-rewrite form)."""
    from .vectors import ivf_assign

    assigned = ivf_assign(delta, id_col, vec_col, centroids)
    return assigned.select(id_col, F.col("cell"), F.col(version_col))


def merge_ivf_assignments(
    stored: DataFrame, update: DataFrame, id_col: str, version_col: str
) -> DataFrame:
    """Merge a tick's cell assignments into the stored map:
    last-writer-wins per id on ``version_col`` (sort-free max_by —
    one partial-aggregating shuffle on the id, never a window sort).
    Replay-safe: a replayed tick re-delivers identical (id, version,
    cell) rows, and max_by over duplicates of the winner returns the
    same row — unlike additive rollups, no double-merge hazard, but
    the shared one-rename commit still makes state+watermark move
    together."""
    merged = stored.unionByName(update)
    return merged.groupBy(id_col).agg(
        F.max_by("cell", F.col(version_col)).alias("cell"),
        F.max(version_col).alias(version_col),
    )
