"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (north star requirement, BASELINE.json):
exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — each expressed as shuffles on small derived keys so the
full text/vector payload never fans out in a cross join.

Scale design:
- exact dedup groups on a 64-bit content hash (tiny shuffle keys);
- MinHash/LSH candidate generation is `O(n·bands)` rows exploded into
  buckets, then a self-join *per bucket* — the classic way pairwise
  similarity survives 100 TB;
- SimHash reduces each doc to one 16-bit signature; near-dup = small
  hamming distance, joinable on signature bands;
- embedding near-dup reuses the LSH bucketing from `vectors`.
All hashing is the engine's portable md5-based family
(functions.hashing) so an external SQL oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    MERSENNE31,
    base_hash31,
    portable_hash64,
    universal_coeffs,
    word_shingles,
)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-content dedup: keep the lowest-id row per distinct text.

    Hash-groupBy on md5(text) with a ``min_by(struct(*), id)`` winner —
    a partial-aggregating hash aggregate, not a row_number window: the
    window form shuffles and SORTS every row (WindowExec has no partial
    aggregation), while min_by collapses each duplicate class map-side
    first, so only one surviving struct per distinct text per input
    partition crosses the shuffle. Measured -29% at sf0.1 (r5
    interleaved A/B, value-identical)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("__fp"))
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("__s"))
        .select("__s.*")
    )


def shingle_hash_rows(
    df: DataFrame, text_col: str, key_cols: list[str], shingle_n: int = 3
) -> DataFrame:
    """(keys..., _h) rows: one row per DISTINCT word-n-gram shingle
    hash per input row, via the token-polynomial family
    (functions.hashing.poly_shingle_expr — md5 once per token, n-grams
    combined arithmetically). Shared base of minhash_signatures and
    delta_minhash_rollup so the sketch families stay identical. The
    token-hash array is materialized through a Generate barrier;
    NULL-text rows contribute no hashes."""
    from ..functions.hashing import poly_shingle_expr, token_hashes

    keys = [F.col(c) for c in key_cols]
    th = df.select(*keys, F.explode(F.array(token_hashes(F.col(text_col)))).alias("_th"))
    return th.select(
        *keys,
        F.explode(F.array_distinct(F.expr(poly_shingle_expr(shingle_n)))).alias("_h"),
    ).filter(F.col("_h").isNotNull())


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
    agg_partitions: int | None = None,
) -> DataFrame:
    """MinHash signature per document: k min-hashes over the word
    n-gram shingle set via a universal hash family — each shingle is
    md5'd ONCE (base hash), the k family members are multiply-adds in
    the Mersenne-31 field.

    Base hashing (r6, changed family): one md5 per TOKEN, shingle
    hash = polynomial combination of its n token hashes in the
    Mersenne field (functions.hashing.poly_shingle_expr — the
    cross-engine contract the DuckDB oracles mirror). The pre-r6 form
    md5'd every shingle STRING, i.e. each byte of text n times plus a
    string build per shingle; the token-poly form was measured 3.4x
    faster at 50k docs and is what let the minhash family's
    Spark/DuckDB ratio stop growing with scale. Signature VALUES
    differ from the old family — collision behavior (what MinHash
    estimates) is equivalent.

    Shape: token-hash array materialized per doc through a Generate
    barrier (md5 once per token; inlined, CollapseProject would
    re-evaluate the array per subscript), explode the distinct shingle
    hashes, then grouped MIN per family member — map-side combining,
    so the shuffle carries only (id, k longs) per document.

    ``agg_partitions``: explicit width for the grouped-min shuffle.
    Default (None) takes the session's shuffle-partition count with
    map-side partial combining — the 100 TB shape. A SMALL explicit
    value is the plan-time analogue of AQE partition coalescing for
    corpora known (from footer stats) to be tiny relative to the
    session: the exploded base-hash rows hash-repartition to that
    width and the aggregate runs single-phase there. The md5 work
    stays on the parallel map side of that exchange either way; what
    is given up is only the partial combine, i.e. the shuffle carries
    (id, hash) per shingle instead of per (doc, partition) — a
    deliberate trade that only makes sense when the exploded volume is
    a few MB (callers gate on row counts, e.g. the sub-GiB bench
    entries), and the reason this is opt-in."""
    from ..plans.partitioning import ensure_parallelism

    exploded = shingle_hash_rows(
        ensure_parallelism(df, id_col), text_col, [id_col], shingle_n
    )
    if agg_partitions is not None:
        exploded = exploded.repartition(agg_partitions, id_col)
    # one parsed expr per family member: literal-folding the (a, b)
    # coefficients into SQL text keeps driver-side plan construction at
    # k py4j calls instead of ~10k (column-algebra construction cost is
    # per-expression-node and dominated vec/dedup build times)
    sig_cols = [
        F.expr(f"min(({a} * _h + {b}) % {MERSENNE31})").alias(f"_m{i}")
        for i, (a, b) in enumerate(universal_coeffs(num_hashes))
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*sig_cols)
        .select(F.col(id_col), F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("minhash"))
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    num_bands: int = 4,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of their MinHash signature
    become a candidate pair. Explode to (band, band_hash, id), then a
    per-bucket self-join — no global cross join ever materializes.

    ``max_bucket_size`` drops degenerate buckets (boilerplate text
    shared by a huge fraction of the corpus) before pair expansion: a
    bucket of B ids emits B(B-1)/2 pairs, so one million-doc bucket is
    5·10¹¹ rows — at production scale always set a cap (pairs inside a
    dropped bucket are exactly the ones near-dup *clustering* doesn't
    need enumerated; route oversized buckets to exact-hash dedup
    instead).
    """
    # bucket key = xxhash64 over the band's signature slice: bucket
    # equality <=> slice equality (64-bit collisions are ~n_buckets^2 /
    # 2^64, vanishing), and hashing the long array directly skips the
    # per-row string build (transform -> concat_ws -> md5) a textual
    # bucket key pays — measured -40% on the full candidate query, and
    # the shuffle key is a fixed 8-byte long instead of a 32-char string
    bands = F.expr(
        "array("
        + ",".join(
            f"struct({b} AS band, xxhash64("
            f"slice(minhash, {b * rows_per_band + 1}, {rows_per_band})) AS bucket)"
            for b in range(num_bands)
        )
        + ")"
    )
    exploded = (
        sig_df.withColumn("_b", F.explode(bands))
        .select(F.col(id_col).alias("id"), F.col("_b.band"), F.col("_b.bucket"))
    )
    # Group ids per bucket and expand pairs inside the array — computes
    # the signatures once (a self-join would re-evaluate the whole
    # upstream for each side) and shuffles only (band, bucket, id).
    ids = F.array_sort(F.collect_list("id"))
    pair_expand = F.expr(
        "flatten(transform(_ids, (x, i) -> transform("
        "slice(_ids, i + 2, size(_ids)), y -> struct(x AS id_a, y AS id_b))))"
    )
    grouped = exploded.groupBy("band", "bucket").agg(ids.alias("_ids")).filter(F.size("_ids") > 1)
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("_ids") <= max_bucket_size)
    return (
        grouped.select(F.explode(pair_expand).alias("_p"))
        .select(F.col("_p.id_a"), F.col("_p.id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(sig_df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard of candidate pairs = fraction of agreeing
    minhash components."""
    a = sig_df.select(F.col(sig_df.columns[0]).alias("id_a"), F.col("minhash").alias("sig_a"))
    b = sig_df.select(F.col(sig_df.columns[0]).alias("id_b"), F.col("minhash").alias("sig_b"))
    k = F.size(F.col("sig_a"))
    agree = F.size(F.filter(F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y), lambda v: v))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("est_jaccard", agree.cast("double") / k.cast("double"))
        .select("id_a", "id_b", "est_jaccard")
    )


def ngram_jaccard(df_pairs: DataFrame, text_a: str, text_b: str, n: int = 2) -> DataFrame:
    """Exact token-set Jaccard between two text columns of an already
    candidate-paired DataFrame (blocked/bucketed upstream — never run
    this on an unblocked cross join at scale).

    Two Generate barriers (r15 optimization): the shingle SETS
    materialize once, then the intersect/union SIZES materialize once.
    The old single-projection form re-evaluated the full
    tokenize+shingle+distinct chain per reference — subexpression
    elimination does not reach across the `when` branches, so the
    union's operands were built for the predicate and again for the
    division, and CollapseProject inlined `sa`/`sb` into every
    consumer (the r7 lesson). Interleaved per-rep-rebuilt A/B on the
    consecutive-pairs consumer: **sf1 19.3 → 0.81 s (0.042x), sf10
    269.6 → 11.2 s (0.041x, same-window under load 34)** — a 24x win,
    results identical (the n=1 caller additionally rides the
    word_shingles token-array short-circuit).

    The internal barrier column names are uniquified against
    ``df_pairs.columns`` (ADVICE r15): a caller whose frame already
    carries a ``_njs``/``_nju`` column must not collide with the
    barriers."""
    njs, nju = "_njs", "_nju"
    while njs in df_pairs.columns or nju in df_pairs.columns:
        njs, nju = njs + "_", nju + "_"
    sa = F.array_distinct(word_shingles(F.col(text_a), n))
    sb = F.array_distinct(word_shingles(F.col(text_b), n))
    sets = df_pairs.select(
        "*",
        F.explode(F.array(F.struct(sa.alias("a"), sb.alias("b")))).alias(njs),
    )
    sizes = sets.select(
        "*",
        F.explode(
            F.array(
                F.struct(
                    F.size(F.array_intersect(f"{njs}.a", f"{njs}.b")).alias("i"),
                    F.size(F.array_union(f"{njs}.a", f"{njs}.b")).alias("u"),
                )
            )
        ).alias(nju),
    ).drop(njs)
    return sizes.withColumn(
        "jaccard",
        F.when(
            F.col(f"{nju}.u") > 0,
            F.col(f"{nju}.i").cast("double") / F.col(f"{nju}.u").cast("double"),
        ).otherwise(F.lit(0.0)),
    ).drop(nju)


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """SimHash document signature: per-token hash, sum ±1 per bit
    position over the token multiset, sign -> bit. 16 bits keeps the
    expression tree tractable while demonstrating the operator; the
    construction is bit-count-generic.

    Pure explode + groupBy: one shuffle on doc id, partial aggregation
    map-side.
    """
    from ..plans.partitioning import ensure_parallelism

    toks = ensure_parallelism(df, id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_tok"),
    ).withColumn("_h", portable_hash64(F.col("_tok")))
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(_h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
            ).alias(f"_b{b}")
            for b in range(bits)
        ]
    )
    sig = " + ".join(
        f"(CASE WHEN _b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return bit_sums.select(F.col(id_col), F.expr(f"CAST({sig} AS BIGINT)").alias("simhash"))


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iters: int = 20
) -> DataFrame:
    """Group near-dup candidate pairs into clusters: iterative
    min-label propagation to a fixpoint — the pairs -> clusters step a
    real dedup pipeline needs before choosing survivors.

    Returns (id, component) where component = min id reachable. Each
    iteration is one join + one aggregation over the edge list
    (O(edges) per pass, label-propagation converges in O(diameter)
    passes — near-dup clusters are shallow, typically <= 3).
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
            # truncate lineage every round — an iterative DataFrame
            # loop otherwise grows its plan (and planning time)
            # exponentially
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_component") != F.col("component")).limit(1).count()
        labels = updated.select("id", F.col("new_component").alias("component"))
        if changed == 0:
            break
    return labels


def cluster_survivors(df: DataFrame, components: DataFrame, id_col: str) -> DataFrame:
    """Keep one canonical row (lowest id) per near-dup cluster;
    rows never paired survive untouched. The final stage of the dedup
    pipeline: candidates (LSH) -> clusters (components) -> survivors."""
    joined = df.join(components, df[id_col] == components.id, "left")
    w = Window.partitionBy(F.coalesce(F.col("component"), df[id_col])).orderBy(df[id_col])
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "id", "component")
    )


def embedding_near_dup(
    emb_df: DataFrame, id_col: str, vec_col: str, bucket_col: str, threshold: float = 0.95
) -> DataFrame:
    """Near-duplicate vectors: cosine > threshold among pairs sharing
    an LSH bucket (bucketing from vectors.hyperplane_buckets). The
    join key is the bucket — candidate set is linear-ish, not n².

    The l2 norms ride the join inputs (r16): inline ``cosine_sim``
    evaluates five interpreted HOF folds PER CANDIDATE PAIR (dot once,
    each norm twice — condition + division); computing each side's
    norm once per VECTOR row in the pre-join projection leaves one
    dot fold per pair (functions.vector.cosine_sim_precomputed_norms,
    the same hoist that took vec_banded_neardup 108 -> 35 s).
    Interleaved same-window A/B at sf10: see OPTIMIZATION_r16.md;
    identical rows (NULL/zero-norm semantics preserved exactly)."""
    from ..functions.vector import cosine_sim_precomputed_norms, l2_norm

    a = emb_df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col(bucket_col).alias("bkt"),
        l2_norm(F.col(vec_col)).alias("_na"),
    )
    b = emb_df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col(bucket_col).alias("bkt"),
        l2_norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        a.join(b, ["bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            cosine_sim_precomputed_norms(
                F.col("vec_a"), F.col("vec_b"), F.col("_na"), F.col("_nb")
            ),
        )
        .filter(F.col("cos") > threshold)
        .select("id_a", "id_b", "cos")
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 4, window: int = 8
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word ``k``-gram, slide
    a window of ``window`` consecutive k-gram hashes, keep each
    window's minimum; the distinct minima are the document's
    fingerprint set. Output: one (id, fingerprint) row per selected
    hash.

    Guarantee: any token run of length >= window + k - 1 shared by two
    documents contributes at least one common fingerprint — so partial
    overlap (plagiarized paragraphs, quoted boilerplate) is detectable
    from ~(n/window) stored hashes per doc, where exact-content
    fingerprints (text.fingerprint) see nothing.

    Plan shape: the k-gram hash array is materialized per row through
    an explode(array(...)) generator — a Project above a Generate
    cannot be collapsed into it, so the md5s are computed once per
    shingle and the window-min transform reads the materialized array
    attribute (O(n*window) cheap long comparisons; the k-fold md5
    recompute CollapseProject would create by inlining the array into
    the lambda body never happens — same discipline as
    minhash_signatures). Per-doc work is row-local; the only shuffle
    downstream consumers pay is on the (fingerprint) key."""
    hashes = F.transform(
        word_shingles(F.col(text_col), k), lambda s: base_hash31(s)
    )
    # Generate barrier: _h becomes a real attribute, computed once
    hashed = df.select(F.col(id_col), F.explode(F.array(hashes)).alias("_h"))
    n_windows = F.greatest(F.size("_h") - F.lit(window - 1), F.lit(1))
    # sliding-window minima as a LEAST zip-with chain over `window`
    # shifted slices (r16, the word_shingles lesson): the old
    # transform(sequence(1, n_windows), i -> array_min(slice(_h, i,
    # window))) allocated a window-sized array PER POSITION in
    # interpreted eval. Values identical: a short tail slice yields
    # fewer elements and zip_with NULL-pads, which `least` skips — the
    # same truncation array_min saw; a NULL hash array stays NULL on
    # both forms (textless docs emit no fingerprints either way).
    minima = F.slice("_h", 1, n_windows)
    for j in range(1, window):
        minima = F.zip_with(
            minima,
            F.slice("_h", 1 + j, n_windows),
            lambda a, b: F.least(a, b),
        )
    # NULL/empty text produces a NULL shingle array, which flows through
    # the window-min transform as a single NULL fingerprint; left in,
    # candidate generation would bucket every textless doc together and
    # emit them as mutual "overlaps". Textless docs have no fingerprints.
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(minima)).alias("fingerprint")
    ).filter(F.col("fingerprint").isNotNull())


def winnow_candidate_pairs(
    fp_df: DataFrame,
    id_col: str,
    min_shared: int = 2,
    max_bucket_size: int | None = 50,
) -> DataFrame:
    """Overlap candidates from winnowing fingerprints: pairs of docs
    sharing >= ``min_shared`` fingerprints, with the shared count as
    the overlap score. Same bucketed shape as LSH banding: group ids
    per fingerprint, expand pairs inside the bucket array, then count
    per pair — no global self-join. ``max_bucket_size`` drops
    ubiquitous-k-gram buckets (stopword runs shared by half the
    corpus) whose pair expansion is quadratic and whose evidence value
    is nil — at production scale always cap."""
    ids = F.array_sort(F.collect_list(id_col))
    pair_expand = F.expr(
        "flatten(transform(_ids, (x, i) -> transform("
        "slice(_ids, i + 2, size(_ids)), y -> struct(x AS id_a, y AS id_b))))"
    )
    grouped = fp_df.groupBy("fingerprint").agg(ids.alias("_ids")).filter(F.size("_ids") > 1)
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("_ids") <= max_bucket_size)
    return (
        grouped.select(F.explode(pair_expand).alias("_p"))
        .groupBy(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def set_similarity_join(
    df: DataFrame, text_col: str, id_col: str, threshold: float
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering
    (Chaudhuri et al. ICDE'06 / PPJoin family) — the exact counterpart
    of the approximate MinHash-LSH candidates: all pairs with
    J(tokens(a), tokens(b)) >= threshold, no false positives OR
    negatives.

    Prefix principle: order every token set canonically by (corpus
    frequency, token) — rarest first — and keep each doc's prefix of
    n - ceil(t*n) + 1 tokens. The smallest common token of any
    qualifying pair provably falls in BOTH prefixes, so bucketing on
    prefix tokens loses nothing; pairs are then verified with the
    exact intersection/union sizes. At scale the shuffle is driven by
    RARE tokens (frequency-ascending order makes common tokens fall
    outside prefixes), which is what keeps bucket sizes bounded on
    Zipf-shaped corpora; a vocabulary where every doc shares most
    tokens (this synthetic fixture) degenerates toward all-pairs —
    real corpora are the sparse case the algorithm exists for.

    Output: (id_a, id_b, jaccard) with id_a < id_b."""
    import math

    toks = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
    docs = df.select(F.col(id_col).alias("_id"), toks.alias("_tk"))
    freq = (
        docs.select(F.explode("_tk").alias("_tok"))
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    # canonical order: sort each doc's tokens by (freq, token)
    ordered = (
        docs.select("_id", "_tk", F.explode("_tk").alias("_tok"))
        .join(freq, "_tok")
        .groupBy("_id")
        .agg(
            F.first("_tk").alias("_tk"),
            F.array_sort(F.collect_list(F.struct("_f", "_tok"))).alias("_sorted"),
        )
    )
    n = F.size("_sorted")
    plen = n - F.ceil(F.lit(threshold) * n).cast("int") + 1
    prefix = (
        ordered.select(
            "_id", "_tk", F.explode(F.slice("_sorted", 1, plen)).alias("_p")
        )
    )
    a = prefix.select(
        F.col("_id").alias("id_a"), F.col("_tk").alias("_tka"), F.col("_p").alias("_pa")
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), F.col("_tk").alias("_tkb"), F.col("_p").alias("_pb")
    )
    inter = F.size(F.array_intersect("_tka", "_tkb"))
    union = F.size("_tka") + F.size("_tkb") - inter
    return (
        a.join(b, (F.col("_pa") == F.col("_pb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.first("_tka").alias("_tka"), F.first("_tkb").alias("_tkb"))
        .select(
            "id_a", "id_b", (inter.cast("double") / union).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def cluster_survivors_by(
    df: DataFrame, components: DataFrame, id_col: str, score: Column
) -> DataFrame:
    """Keep the best row per near-dup cluster by an arbitrary score
    expression (ties: lowest id) — the quality-weighted survivor
    pick: when near-duplicates differ (OCR noise vs clean copy,
    truncated vs full), keep the best copy, not the accidental
    lowest-id one. Same partial-aggregating max_by shape as
    exact_dedup: one struct per cluster per partition crosses the
    shuffle, never a sort."""
    joined = df.join(components, df[id_col] == components.id, "left")
    cluster = F.coalesce(F.col("component"), df[id_col])
    keep = [c for c in df.columns]
    return (
        joined.groupBy(cluster.alias("_cl"))
        .agg(
            F.max_by(
                F.struct(*[df[c] for c in keep]),
                F.struct(score.alias("_s"), (-df[id_col]).alias("_tb")),
            ).alias("_w")
        )
        .select("_w.*")
    )
