"""Relational operators Spark lacks as single calls, composed from
DataFrame primitives (SURVEY §2.3 J6/J7, §2.9 sessionization).

Each is one shuffle on its natural key — no cross joins, no driver
loops — so the composition survives a 1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row of the same
    key with ``right_ts <= left_ts`` (the CDC "current snapshot at t"
    operator, SURVEY §2.3 J7).

    Implemented as union + one window pass — a single shuffle on
    ``on`` — instead of a range join (which would need a BNL join) or
    per-group merge_asof in Python. Scales with the key cardinality:
    each key's timeline sorts independently.
    """
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_tagged = (
        right.select(on, right_ts, *right_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
    )
    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in [right_ts, *right_cols]
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side", "_ts", right_ts, *right_cols)
    for c in [right_ts, *right_cols]:
        out = out.withColumnRenamed(f"_r_{c}", c)
    return out


def sessionize(
    df: DataFrame, key: str, ts_col: str, gap_minutes: int = 30, *tiebreak_cols: str
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_minutes``. Classic
    lag + conditional cumsum — one shuffle on the key. Pass
    ``tiebreak_cols`` to pin a total order under equal timestamps."""
    w = Window.partitionBy(key).orderBy(ts_col, *tiebreak_cols)
    gap_sec = gap_minutes * 60
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull() | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_sec), 1
    ).otherwise(0)
    return df.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new")


def top_k_per_group(df: DataFrame, group_cols: list[str], order_col: str, k: int, desc: bool = True) -> DataFrame:
    """Top-k rows per group via one ranking window (Catalyst executes
    as partial top-k per partition under AQE, no global sort)."""
    order = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(order)
    return df.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def consecutive_pairs(
    df: DataFrame,
    key_col: str,
    val_col: str,
    bucket_width: int = 1000,
    out_col: str = "next_val",
) -> DataFrame:
    """``lead(val_col) OVER (ORDER BY key_col)`` — globally-consecutive
    pairing — without a global single-partition window.

    Rows are range-bucketed by ``key_col // bucket_width``; the lead
    runs per bucket (parallel), and bucket-boundary rows are filled by
    joining each bucket to the first value of the next non-empty
    bucket. That fill uses one ordered window over *bucket aggregates*
    — O(n / bucket_width) rows, not O(n) — so pick ``bucket_width``
    such that n/bucket_width fits one task comfortably (e.g. 1e6 at
    1e12 rows). Result is identical to the global-window form for any
    key distribution, gaps included.
    """
    d = df.withColumn("_b", F.floor(F.col(key_col) / bucket_width).cast("long"))
    wb = Window.partitionBy("_b").orderBy(key_col)
    within = d.withColumn(out_col, F.lead(val_col).over(wb))
    firsts = d.groupBy("_b").agg(F.min_by(val_col, F.col(key_col)).alias("_first"))
    # One row per non-empty bucket: n/bucket_width rows by construction,
    # sized to fit a single task (see docstring). The constant partition
    # key makes that single-task execution explicit and intended — this
    # is NOT an accidental whole-table window (a k²/2 self-join
    # alternative would be strictly worse at k = n/bucket_width rows).
    wfill = Window.partitionBy(F.lit(0)).orderBy("_b")
    fill = firsts.withColumn("_bnext", F.lead("_first").over(wfill)).select("_b", "_bnext")
    return (
        within.join(fill, "_b", "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col("_bnext")))
        .drop("_b", "_bnext")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key into
    ``salt_buckets`` sub-keys and replicate the small side across all
    buckets, so one hot key spreads over ``salt_buckets`` tasks
    instead of stalling a single reducer.

    Complements AQE's skew-join splitting (enabled in the session
    factory), which only kicks in for sort-merge joins past size
    thresholds — salting also covers aggregation-feeding joins and
    deterministic plans. Cost: small side replicated x buckets, so
    keep it for genuinely small dimension sides.

    Outer semantics: big-preserving ('left') falls out of the salted
    join directly — each big row carries exactly ONE salt value, so a
    null-extended miss surfaces once, never per-bucket. Small-preserving
    ('right'/'full') cannot ride the replicated side (an unmatched small
    row would surface ``salt_buckets`` times); those rows are recovered
    by a key anti-join against the big side's distinct keys — a second
    small shuffle on the same key, null-extended and unioned in.

    ``salt_cols`` (r16, guide §2.3): the salt is a deterministic
    per-row hash, and by default it hashes the WHOLE row — which
    references every big-side column and therefore blocks column
    pruning at the scan (join_salted_skew read all 16 lineitem columns
    for a 2-column aggregate). The join result is salt-INVARIANT (any
    deterministic row function spreads a hot key; the salt is dropped
    before the caller sees a row), so callers that know a narrow
    high-entropy column set — ideally a unique key like
    (orderkey, linenumber) — should pass it and let pruning reach the
    scan. Default stays all columns: generic safety over speed.
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            f"salted_join supports inner/left/right/full, got {how!r}"
        )
    # deterministic salt: hash of the (sub)row, stable across runs and
    # repartitions (F.rand would depend on partition order)
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.hash(*(salt_cols or big.columns)), F.lit(salt_buckets)).cast("int"),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    base_how = "left" if how in ("left", "full") else "inner"
    out = salted_big.join(salted_small, [on, "_salt"], base_how).drop("_salt")
    if how in ("right", "full"):
        # unmatched small rows: key never present in big (equi-join, so
        # match status is a pure key property; NULL keys never match and
        # correctly survive the anti join as unmatched)
        unmatched = small.join(big.select(on).distinct(), [on], "left_anti")
        big_types = {f.name: f.dataType for f in big.schema.fields}
        filled = unmatched.select(
            F.col(on),
            *[
                F.lit(None).cast(big_types[c]).alias(c)
                for c in big.columns
                if c != on
            ],
            *[F.col(c) for c in small.columns if c != on],
        )
        out = out.unionByName(filled)
    return out


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Scale path for the interval/band join (SURVEY §2.3 J6): point p
    joins interval [lo, hi] iff lo <= p <= hi.

    The naive plan is a broadcast-nested-loop / cartesian product —
    O(|points| x |intervals|) comparisons, unusable when both sides are
    large. This operator turns it into an *equi*-join: both sides are
    bucketed into fixed-width bins (intervals explode into every bin
    they overlap — ceil(width/bin_width)+1 rows), the join keys on the
    bin id (hash/sort-merge, shuffles on the bin), and the exact band
    predicate runs as a post-join residual filter. Replication factor
    stays bounded as long as ``bin_width`` is on the order of the
    typical interval width, so a 100 TB x 100 TB band join shuffles
    linearly instead of multiplying.

    Outer semantics can't ride the binned join directly (the residual
    filter would discard null-extended rows, and an exploded interval
    would surface once per overlapped bin): unmatched rows of the
    preserved side(s) are recovered with a whole-row null-safe
    anti-join against the inner result's distinct preserved-side rows,
    then null-extended and unioned in. Identical duplicate rows share
    one match status, so multiplicity is preserved exactly like a
    plain outer join. Cost: one extra shuffle per preserved side, on
    the same derived keys — still no cartesian pass.
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            f"binned_range_join supports inner/left/right/full, got {how!r}"
        )
    pb = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    inner = (
        pb.join(ib, "_bin")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bin")
    )
    if how == "inner":
        return inner
    out = inner

    def _unmatched(side: DataFrame, other: DataFrame) -> DataFrame:
        """Rows of ``side`` absent (null-safely, whole-row) from the
        inner result, null-extended over ``other``'s columns."""
        matched = inner.select(*side.columns).distinct().alias("_m")
        s = side.alias("_s")
        cond = None
        for c in side.columns:
            eq = F.col(f"_s.{c}").eqNullSafe(F.col(f"_m.{c}"))
            cond = eq if cond is None else (cond & eq)
        other_types = {f.name: f.dataType for f in other.schema.fields}
        return s.join(matched, cond, "left_anti").select(
            "*",
            *[
                F.lit(None).cast(other_types[c]).alias(c)
                for c in other.columns
            ],
        )

    if how in ("left", "full"):
        out = out.unionByName(_unmatched(points, intervals))
    if how in ("right", "full"):
        out = out.unionByName(_unmatched(intervals, points))
    return out


def band_count_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    left_val: str,
    right_val: str,
    delta: float,
    bin_width: float,
    count_alias: str = "n_in_band",
) -> DataFrame:
    """COUNT-of-band-matches without materializing the matches: for
    each left row, how many right rows have ``right_val`` within
    ``left_val ± delta``. Returns ``left_keys + count_alias``.

    The r10 sf10 parity sweep caught the naive form (band BNL join,
    then count per key) as a scale-killer: the MATCHED PAIRS are the
    blowup — at sf10 the supplier x customer ±100 band yields ~2.7
    BILLION pairs that exist only to be counted, and even the binned
    equi-join (binned_range_join) must surface every one. When the
    aggregate is a count, it pushes below the join entirely:

      count(val in [lo, hi]) = F(hi) - F(lo⁻)

    with F the cumulative count of right values. F is evaluated at
    2|left| band endpoints via a two-level distributed prefix sum —
    (a) right collapses to per-(bin, value) counts, (b) a DENSE
    per-bin prefix table (window over ~value_range/bin_width rows —
    bounded by the VALUE DOMAIN, not the data, so the single-partition
    window is safe at any scale; size ``bin_width`` to keep it so),
    (c) each endpoint equi-joins its OWN bin's values for the partial
    (<= for the hi endpoint, < for lo) and adds the prefix below its
    bin. Endpoints outside the populated bin range clamp to 0 / total.
    Cost is linear in |left| + |right| plus |endpoints| x
    values-per-bin — never |left| x |right|, and the 2.7B pairs never
    exist. NULL left_val counts 0 (a NULL band matches nothing);
    NULL right_val rows never match (mirrors ``between``).

    ``left_keys`` must uniquely identify left rows (duplicate keys
    would merge their endpoint contributions).
    """
    val = F.col(right_val)
    rv = (
        right.filter(val.isNotNull())
        .groupBy(
            F.floor(val / F.lit(bin_width)).cast("long").alias("_bin"),
            val.alias("_v"),
        )
        .agg(F.count(F.lit(1)).alias("_vc"))
    )
    per_bin = rv.groupBy("_bin").agg(F.sum("_vc").alias("_bc"))
    bounds = per_bin.agg(
        F.min("_bin").alias("_b0"),
        F.max("_bin").alias("_b1"),
        F.sum("_bc").alias("_total"),
    )
    dense = bounds.select(
        F.explode(F.sequence(F.col("_b0"), F.col("_b1"))).alias("_bin")
    )
    w = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        dense.join(per_bin, "_bin", "left")
        .select("_bin", F.coalesce(F.col("_bc"), F.lit(0)).alias("_bc"))
        .select("_bin", F.coalesce(F.sum("_bc").over(w), F.lit(0)).alias("_cum_prev"))
    )
    lv = F.col(left_val)
    ep = left.select(*left_keys, lv.alias("_lv")).select(
        *left_keys,
        F.explode(
            F.array(
                F.struct(
                    (F.col("_lv") + F.lit(delta)).alias("_e"),
                    F.lit(1).alias("_sign"),
                    F.lit(1).alias("_incl"),
                ),
                F.struct(
                    (F.col("_lv") - F.lit(delta)).alias("_e"),
                    F.lit(-1).alias("_sign"),
                    F.lit(0).alias("_incl"),
                ),
            )
        ).alias("_ep"),
    ).select(
        *left_keys,
        F.col("_ep._e").alias("_e"),
        F.col("_ep._sign").alias("_sign"),
        F.col("_ep._incl").alias("_incl"),
        F.floor(F.col("_ep._e") / F.lit(bin_width)).cast("long").alias("_ebin"),
    )
    # partial inside the endpoint's own bin: values <= e (hi) / < e (lo)
    in_bin = (
        ep.join(rv, ep["_ebin"] == rv["_bin"], "left")
        .withColumn(
            "_hit",
            F.when(
                F.when(F.col("_incl") == 1, F.col("_v") <= F.col("_e")).otherwise(
                    F.col("_v") < F.col("_e")
                ),
                F.col("_vc"),
            ).otherwise(F.lit(0)),
        )
        .groupBy(*left_keys, "_e", "_sign", "_incl", "_ebin")
        .agg(F.sum("_hit").alias("_partial"))
    )
    # prefix below the bin, clamped outside the populated range; the
    # prefix and bounds relations are bin-count-sized — broadcast
    f_vals = (
        in_bin.join(F.broadcast(prefix), in_bin["_ebin"] == prefix["_bin"], "left")
        .crossJoin(F.broadcast(bounds))
        .select(
            *left_keys,
            "_sign",
            F.when(F.col("_ebin") < F.col("_b0"), F.lit(0))
            .when(F.col("_ebin") > F.col("_b1"), F.col("_total"))
            .otherwise(F.col("_cum_prev") + F.col("_partial"))
            .alias("_f"),
        )
    )
    return f_vals.groupBy(*left_keys).agg(
        F.coalesce(F.sum(F.col("_sign") * F.col("_f")), F.lit(0)).alias(count_alias)
    )


def binned_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Interval x interval OVERLAP join — the J6 variant
    binned_range_join (point-in-band) doesn't cover: row pairs with
    [a_lo, a_hi] ∩ [b_lo, b_hi] ≠ ∅ (closed-interval semantics,
    a_lo <= b_hi AND b_lo <= a_hi).

    Scale shape: both sides explode into the fixed-width bins their
    interval touches and the join keys on the bin id — an equi-join
    shuffle, never a cartesian/BNL pass. A pair overlapping several
    shared bins would surface once per bin; instead of a distinct pass
    (a full extra shuffle of the output), each pair is kept only at
    its CANONICAL bin — max(floor(a_lo/W), floor(b_lo/W)), the first
    bin both intervals occupy, which for any overlapping pair exists
    and is unique. The exact overlap predicate runs as a post-join
    residual. Replication = interval_width/bin_width + 1 rows per
    side, so size ``bin_width`` to the typical interval width.

    Outer modes recover unmatched preserved-side rows with the same
    whole-row null-safe anti-join binned_range_join uses."""
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            f"binned_overlap_join supports inner/left/right/full, got {how!r}"
        )

    def bins(lo: str, hi: str):
        return F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi) / F.lit(bin_width)).cast("long"),
            )
        )

    ab = a.withColumn("_bin", bins(a_lo, a_hi))
    bb = b.withColumn("_bin", bins(b_lo, b_hi))
    canonical = F.greatest(
        F.floor(F.col(a_lo) / F.lit(bin_width)).cast("long"),
        F.floor(F.col(b_lo) / F.lit(bin_width)).cast("long"),
    )
    inner = (
        ab.join(bb, "_bin")
        .filter(F.col("_bin") == canonical)
        .filter((F.col(a_lo) <= F.col(b_hi)) & (F.col(b_lo) <= F.col(a_hi)))
        .drop("_bin")
    )
    if how == "inner":
        return inner

    out = inner

    def _unmatched(side: DataFrame, other: DataFrame) -> DataFrame:
        matched = inner.select(*side.columns).distinct().alias("_m")
        s = side.alias("_s")
        cond = None
        for c in side.columns:
            eq = F.col(f"_s.{c}").eqNullSafe(F.col(f"_m.{c}"))
            cond = eq if cond is None else (cond & eq)
        other_types = {f.name: f.dataType for f in other.schema.fields}
        return s.join(matched, cond, "left_anti").select(
            "*",
            *[F.lit(None).cast(other_types[c]).alias(c) for c in other.columns],
        )

    if how in ("left", "full"):
        out = out.unionByName(_unmatched(a, b))
    if how in ("right", "full"):
        out = out.unionByName(_unmatched(b, a))
    return out


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    num_slots: int = 64,
    num_probes: int = 4,
) -> DataFrame:
    """Equi-join with a Bloom-filter pre-filter on the fact side — the
    runtime-filter pattern (Spark's own runtime.bloomFilter injects
    this automatically for some shapes; this operator is the explicit,
    portable form): build a ``num_slots``×64-bit Bloom filter over the
    dim keys (one aggregation — num_slots bit_or partial aggregates,
    combining map-side), broadcast the single filter row, drop fact
    rows failing any of the ``num_probes`` membership probes BEFORE
    the join shuffle, then run the exact join.

    Result is EXACTLY the plain join: a Bloom filter has no false
    negatives, and false positives (rate ~(1-e^(-kn/m))^k — size
    num_slots to the dim key count) only let extra rows through to the
    exact join, which discards them. The win is shuffle volume: at
    100 TB a selective dim means most fact rows never enter the
    exchange. Probes are xxhash64(key, seed) — pure codegen, no UDF,
    no driver round-trip (the filter rides a broadcast cross join).
    ``how`` must be inner or left_semi: preserved-fact outer joins
    cannot drop fact rows early."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_prefilter_join supports inner/left_semi, got {how!r}")
    m_bits = num_slots * 64

    def pos(i: int) -> str:
        return f"pmod(xxhash64({on}, {i}), {m_bits})"

    slot_masks = [
        " | ".join(
            f"(CASE WHEN ({pos(i)} DIV 64) = {j}"
            f" THEN shiftleft(1L, CAST({pos(i)} % 64 AS INT)) ELSE 0L END)"
            for i in range(num_probes)
        )
        for j in range(num_slots)
    ]
    bloom = dim.select(
        *[F.expr(m).alias(f"_s{j}") for j, m in enumerate(slot_masks)]
    ).agg(
        F.expr(
            "array(" + ", ".join(f"bit_or(_s{j})" for j in range(num_slots)) + ") AS _bf"
        )
    )
    probe = None
    for i in range(num_probes):
        hit = F.expr(
            f"(element_at(_bf, CAST({pos(i)} DIV 64 AS INT) + 1)"
            f" >> CAST({pos(i)} % 64 AS INT)) & 1 = 1"
        )
        probe = hit if probe is None else (probe & hit)
    filtered = fact.crossJoin(F.broadcast(bloom)).filter(probe).drop("_bf")
    return filtered.join(dim, on, how)


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "dense_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 0..n-1 ids in total ``order_cols`` order WITHOUT a
    global single-partition sort — the stable-corpus-ids op every
    training pipeline needs (shard-stable sample numbering, vocab
    ids, example ids for split bookkeeping).

    The single-window form (row_number over a global ORDER BY) sorts
    the entire table through ONE partition — the canonical scale
    killer. Instead: range-repartition on the keys (the same sampled
    boundaries a distributed sort uses), per-partition row_number
    (parallel windows, each sorting only its slice), and add broadcast
    cumulative offsets computed from the tiny per-partition counts.

    The range partitioning is MATERIALIZED once (eager
    localCheckpoint) before the counts job: RangePartitioner's sampled
    boundaries are seeded per RDD, so the offsets job and the final
    job would otherwise each draw their OWN boundaries and the offsets
    would describe a partitioning the final job doesn't have —
    block-shifted ids (observed, 9% of rows at sf0.01). The
    materialization is the same cost class as the shuffle a
    distributed sort pays anyway.

    ``order_cols`` must be a total order (unique composite) for the
    ids to be deterministic — ties would fall arbitrarily within a
    partition."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["_n"]
    omap = F.create_map(
        *[F.lit(x) for pid_off in sorted(offsets.items()) for x in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn(
            id_col,
            (F.row_number().over(w) - 1 + omap[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )


def sequence_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Ordered multi-step funnel (MATCH_RECOGNIZE-lite): per user, the
    greedy-first completion chain t1 < t2 < ... over the given step
    types, each step optionally within ``max_gap_seconds`` of the
    previous. Output: (user, t1..tk) with NULLs from the first failed
    step on — the per-step drop-off a conversion report reads directly.

    Semantics are GREEDY-FIRST (each step binds to its earliest
    qualifying event), the standard product-analytics funnel rule —
    deterministic and O(steps) passes, but not existence-maximal under
    gap constraints (a later step-i event can leave more slack for
    step i+1; finding any satisfying chain is a per-user DP — the
    state-machine-over-sorted-events form via applyInPandasWithState
    is the streaming cousin).

    Scale shape: step i is a filtered scan pre-aggregated to one row
    per user (map-side combining min_by) joined user-keyed onto the
    chain so far — never an event-level self-join; k steps = k
    user-keyed state-sized joins."""
    chain = None
    for i, step in enumerate(steps, 1):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if chain is None:
            chain = ev.groupBy("_u").agg(F.min("_ts").alias(f"t{i}"))
        else:
            cond_ts = F.col("_ts") > F.col(f"t{i - 1}")
            if max_gap_seconds is not None:
                cond_ts = cond_ts & (
                    F.unix_micros(F.col("_ts"))
                    <= F.unix_micros(F.col(f"t{i - 1}")) + max_gap_seconds * 1_000_000
                )
            nxt = (
                ev.join(chain.select("_u", f"t{i - 1}"), "_u")
                .filter(cond_ts)
                .groupBy("_u")
                .agg(F.min("_ts").alias(f"t{i}"))
            )
            chain = chain.join(nxt, "_u", "left")
    return chain.withColumnRenamed("_u", user_col)


def sequence_funnel_maximal(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """EXISTENCE-MAXIMAL funnel — the variant ``sequence_funnel``'s
    greedy-first docstring concedes. Under a per-step gap constraint,
    binding step i to its EARLIEST qualifying event can kill a chain a
    later event would keep alive (a later step-i event leaves more
    slack for step i+1). Here step i's reported time is
    ``min(F_i)`` where ``F_i`` is the set of ALL event times that can
    end a feasible i-step prefix — so ``t{k}`` is the earliest time
    the funnel can complete under ANY valid chain, and a user
    completes iff a satisfying chain exists at all. Output matches
    sequence_funnel's shape: (user, t1..tk), NULL from the first step
    with an empty feasible set (F_i nonempty requires F_{i-1}
    nonempty, so NULLs are prefix-closed).

    Implementation (r16, guide §4 — the registry's last Python
    boundary): chained RANGE-frame windows, no ``applyInPandas``. An
    event t of type step_i is feasible iff some t' in F_{i-1} has
    t' < t <= t' + gap, i.e. iff F_{i-1} intersects the half-open
    interval [t - gap, t). Event times are integer microseconds, so
    that interval is exactly the window frame
    ``rangeBetween(-gap_us, -1)`` over the user partition ordered by
    time: feasibility of step i = ``max(when(feasible_{i-1}, t_us))``
    over that frame being non-NULL. The frame end at -1 enforces the
    strict t' < t (same-instant events never chain — the DP batched
    equal timestamps for the same reason), and the frame start at
    -gap_us enforces the inclusive t <= t' + gap. k steps chain k-1
    windows over ONE partition+sort (same spec, so one Exchange and
    one Sort), and the per-user minima ride the same partitioning into
    a final hash aggregate — zero Python, zero extra shuffles. The
    pandas DP this replaces is kept as
    ``_sequence_funnel_maximal_dp`` below, the reference
    implementation the equivalence tests pin the window form against.

    Scale shape: one shuffle on the user key, per-user work linear in
    that user's events (the range frame advances monotonically; it
    never rescans the partition)."""
    gap_us = None if max_gap_seconds is None else int(max_gap_seconds) * 1_000_000
    k = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    # map the step type to its index once; NULL timestamps are dropped
    # up front (SQL comparison semantics make a NULL ts never-chaining,
    # ADVICE r6 — same filter the DP form used)
    mapping = F.create_map(*[F.lit(x) for s in steps for x in (s, step_idx[s])])
    ev = df.filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()).select(
        F.col(user_col),
        F.col(ts_col).alias("_ts"),
        F.unix_micros(F.col(ts_col)).alias("_tus"),
        mapping[F.col(type_col)].cast("int").alias("_si"),
    )
    lo = Window.unboundedPreceding if gap_us is None else -gap_us
    base = Window.partitionBy(user_col).orderBy("_tus")
    cur = ev.withColumn("_f0", F.col("_si") == 0)
    for i in range(1, k):
        witness = F.max(
            F.when(F.col(f"_f{i - 1}"), F.col("_tus"))
        ).over(base.rangeBetween(lo, -1))
        cur = cur.withColumn(f"_f{i}", (F.col("_si") == i) & witness.isNotNull())
    out = cur.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(f"_f{i}"), F.col("_ts"))).alias(f"t{i + 1}")
            for i in range(k)
        ]
    )
    return out.filter(F.col("t1").isNotNull())


def _sequence_funnel_maximal_dp(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Reference implementation of :func:`sequence_funnel_maximal`:
    the original per-user pandas DP (one Arrow-batched applyInPandas
    pass, O(events * steps) per user). Scanning ascending, an event t
    of type step_i extends a feasible prefix iff some t' in F_{i-1}
    has t' < t <= t' + gap; the best witness is the LARGEST feasible
    t' strictly below t (its upper bound t'+gap is loosest), so per
    step only the max feasible time — plus the min for reporting — is
    carried, never the full set. Events sharing a timestamp are
    batched so same-instant chaining (t' < t is strict) cannot occur
    through intra-batch state updates.

    Kept ONLY as the independent oracle for the window-form
    equivalence tests (r16): not referenced by any declared query."""
    import pandas as pd

    gap_us = None if max_gap_seconds is None else int(max_gap_seconds) * 1_000_000
    k = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    user_field = df.schema[user_col]
    out_schema = ", ".join(
        [f"{user_col} {user_field.dataType.simpleString()}"]
        + [f"t{i + 1} timestamp" for i in range(k)]
    )

    def dp(pdf: pd.DataFrame) -> pd.DataFrame:
        user = pdf[user_col].iloc[0]
        t_us = pdf["_ts"].astype("datetime64[us]").astype("int64").to_numpy()
        s_idx = pdf["_si"].to_numpy()
        order = t_us.argsort(kind="stable")
        maxfeas = [None] * k  # largest feasible end time per prefix
        minfeas = [None] * k  # smallest (reported)
        i = 0
        n = len(order)
        while i < n:
            j = i
            t = t_us[order[i]]
            updates = []
            while j < n and t_us[order[j]] == t:  # same-instant batch
                si = s_idx[order[j]]
                if si == 0:
                    updates.append(0)
                else:
                    w = maxfeas[si - 1]
                    if w is not None and w < t and (gap_us is None or t <= w + gap_us):
                        updates.append(si)
                j += 1
            for si in updates:  # state visible only to later instants
                maxfeas[si] = t if maxfeas[si] is None else max(maxfeas[si], t)
                minfeas[si] = t if minfeas[si] is None else min(minfeas[si], t)
            i = j
        row = {user_col: user}
        for i in range(k):
            row[f"t{i + 1}"] = (
                pd.Timestamp(minfeas[i], unit="us") if minfeas[i] is not None else pd.NaT
            )
        return pd.DataFrame([row])

    # map the step type to its index JVM-side so the pandas fn never
    # string-compares. NULL timestamps are dropped up front: SQL
    # comparison semantics make a NULL ts never-chaining (t' < t is
    # unknown), while pandas NaT would coerce to int64-min in the DP
    # and fabricate an always-feasible prefix (ADVICE r6).
    mapping = F.create_map(*[F.lit(x) for s in steps for x in (s, step_idx[s])])
    ev = (
        df.filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col),
            F.col(ts_col).alias("_ts"),
            mapping[F.col(type_col)].cast("int").alias("_si"),
        )
    )
    return (
        ev.groupBy(user_col)
        .applyInPandas(dp, schema=out_schema)
        .filter(F.col("t1").isNotNull())
    )


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    period: str = "month",
) -> DataFrame:
    """Cohort retention matrix: each entity's cohort is the period
    (``month`` or ``day``) of its FIRST event; for every
    (cohort, period_offset) cell, count the distinct entities from
    that cohort active ``period_offset`` periods later — the classic
    product-analytics retention triangle the funnel family
    (``sequence_funnel*``) doesn't cover.

    Output: (cohort timestamp, period_offset int, n_active long).
    Offset 0 rows are each cohort's size, so retention RATE is a
    cheap self-join/window on this (cohort-count)-sized result.

    Scale shape: ONE entity-keyed shuffle. The naive form — a
    per-entity firsts aggregate joined back onto a distinct
    (entity, period) activity set — costs two shuffles plus an
    entity-keyed join whose probe side is the whole fact table.
    Instead ``min`` and ``collect_set`` of the truncated period ride
    the SAME groupBy (both combine map-side), and the retention cells
    come from exploding the per-entity period set — bounded by the
    CALENDAR (an entity active every month for 80 years is <1k
    entries), not by event count, so per-entity state stays KB-sized
    at 100 TB. The final groupBy is on (cohort, offset) — at most
    |periods|² cells, a constant-sized frame."""
    if period not in ("month", "day"):
        raise ValueError(f"period must be 'month' or 'day', got {period!r}")
    p = F.date_trunc(period, F.col(ts_col))
    per_entity = (
        df.filter(F.col(ts_col).isNotNull())
        .select(F.col(entity_col).alias("_e"), p.alias("_p"))
        .groupBy("_e")
        .agg(F.min("_p").alias("cohort"), F.collect_set("_p").alias("_ps"))
    )
    exploded = per_entity.select("cohort", F.explode("_ps").alias("_p"))
    if period == "month":
        off = F.months_between(F.col("_p"), F.col("cohort")).cast("int")
    else:
        off = F.datediff(F.col("_p"), F.col("cohort")).cast("int")
    return (
        exploded.groupBy("cohort", off.alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
