"""Properties of the deterministic sampling/split operators
(operators.sampling): stability under repartition (the property
randomSplit/sample lack), partition/coverage invariants, and the
single-pass profiler against directly computed answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.sampling import (
    hash_split,
    kfold_assign,
    profile_columns,
    stratified_sample,
)
from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table

FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_hash_split_partitions_every_row(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = hash_split(d, "doc_id", FRACTIONS)
    assert out.count() == d.count()
    assert out.filter(~F.col("split").isin(*FRACTIONS)).count() == 0
    # every split non-empty at any sf
    assert out.select("split").distinct().count() == 3


def test_hash_split_stable_under_repartition(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = hash_split(d, "doc_id", FRACTIONS).select("doc_id", "split")
    b = hash_split(d.repartition(17, "lang"), "doc_id", FRACTIONS).select(
        "doc_id", "split"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hash_split_fractions_approx(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n = d.count()
    got = dict(
        hash_split(d, "doc_id", FRACTIONS)
        .groupBy("split")
        .count()
        .collect()
    )
    for name, frac in FRACTIONS.items():
        # 500 keys at sf0.001: allow generous binomial slack
        assert abs(got.get(name, 0) / n - frac) < 0.08, (name, got)


def test_stratified_sample_respects_rates_and_determinism(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rates = {"en": 0.5, "zh": 0.4}
    s1 = stratified_sample(d, "lang", "doc_id", rates, default_rate=0.25, seed=7)
    s2 = stratified_sample(
        d.repartition(13), "lang", "doc_id", rates, default_rate=0.25, seed=7
    )
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids1 == ids2 and ids1  # deterministic + non-empty
    per = {r.lang: r for r in d.groupBy("lang").count().collect()}
    kept = {r.lang: r for r in s1.groupBy("lang").count().collect()}
    for lang, rate in rates.items():
        assert kept[lang]["count"] <= per[lang]["count"]
        assert abs(kept[lang]["count"] / per[lang]["count"] - rate) < 0.2


def test_kfold_covers_all_folds_disjointly(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = kfold_assign(d, "doc_id", k=5, seed=11)
    assert out.count() == d.count()  # a row lands in exactly one fold
    folds = {r.fold for r in out.select("fold").distinct().collect()}
    assert folds == {0, 1, 2, 3, 4}
    # seed changes the assignment
    other = kfold_assign(d, "doc_id", k=5, seed=12)
    joined = out.alias("a").join(other.alias("b"), "doc_id")
    assert joined.filter(F.col("a.fold") != F.col("b.fold")).count() > 0


def test_profile_columns_matches_direct_answers(spark, sf_dir):
    d = _docs(spark, sf_dir)
    prof = {
        r.col_name: r
        for r in profile_columns(d, ["doc_id", "lang", "n_chars"]).collect()
    }
    n = d.count()
    for c in ("doc_id", "lang", "n_chars"):
        assert prof[c].n_rows == n
        assert prof[c].n_nonnull == d.filter(F.col(c).isNotNull()).count()
        assert prof[c].n_distinct == d.select(c).distinct().count()
    direct = d.agg(F.min("n_chars"), F.max("n_chars")).first()
    assert prof["n_chars"].min_val == str(direct[0])
    assert prof["n_chars"].max_val == str(direct[1])


def test_profile_is_single_job_single_scan(spark, sf_dir):
    d = _docs(spark, sf_dir)
    plan = (
        profile_columns(d, ["doc_id", "lang", "n_chars"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one parquet scan feeding one aggregate, not one scan per column
    assert plan.count("Scan parquet") == 1


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """Every near-dup cluster must land in exactly one split, and the
    plain per-row hash_split must demonstrably violate that on the same
    corpus (the contamination channel this operator closes)."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import dedup
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    sig = dedup.minhash_signatures(doubled, "text", "doc_id", num_hashes=16)
    pairs = dedup.lsh_candidate_pairs(sig, "doc_id", num_bands=4, rows_per_band=4)
    comp = dedup.connected_components(pairs)

    safe = leakage_safe_split(
        doubled, "doc_id", comp, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    per_cluster = safe.groupBy("cluster_label").agg(
        F.countDistinct("split").alias("k"), F.count(F.lit(1)).alias("n")
    )
    assert per_cluster.filter(F.col("k") > 1).count() == 0
    # doubling guarantees multi-member clusters exist, so the invariant
    # is non-vacuous
    assert per_cluster.filter(F.col("n") > 1).count() > 0

    # the naive split DOES scatter at least one cluster across splits
    naive = hash_split(doubled, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    leaked = (
        naive.join(comp, naive.doc_id == comp.id)
        .groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leaked > 0


def test_leakage_safe_split_caller_id_component_columns(spark):
    """Regression (ADVICE r4): a caller df whose own columns are named
    ``id`` or ``component`` must survive the internal label join — the
    components frame is re-aliased internally, so neither an ambiguous
    join reference nor a silent drop of the caller's columns."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.sampling import (
        leakage_safe_split,
    )

    df = spark.createDataFrame(
        [("a", 1, "keep-a"), ("b", 2, "keep-b"), ("c", 3, "keep-c")],
        "id string, component int, payload string",
    )
    comps = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "id string, component string"
    )
    out = leakage_safe_split(df, "id", comps, {"train": 0.5, "test": 0.5})
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    # caller's own columns intact
    assert rows["a"]["component"] == 1 and rows["a"]["payload"] == "keep-a"
    # clustered rows share a split; singleton got its own label
    assert rows["a"]["split"] == rows["b"]["split"]
    assert rows["c"]["cluster_label"] == "c"


def test_weighted_sample_tracks_weights_and_is_repartition_stable(spark):
    """A-Res invariants: (a) selection is identical under repartition
    (hash-deterministic, the module's core property); (b) across many
    seeds, a 10x-weight item is included far more often than a 1x one
    (inclusion odds track weights); (c) exactly k rows per stratum."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, "g", 10.0 if i < 10 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string, w double")

    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", 10, ["g"], seed=3).collect())
    b = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(13), "id", "w", 10, ["g"], seed=3).collect()
    )
    assert a == b and len(a) == 10

    heavy = light = 0
    for seed in range(30):
        got = {r["id"] for r in weighted_sample(df, "id", "w", 10, ["g"], seed=seed).collect()}
        heavy += sum(1 for i in got if i < 10)
        light += sum(1 for i in got if i >= 10)
    # 10 heavy items at weight 10 vs 90 light at weight 1: heavy items
    # should take well over a third of the 300 sampled slots (expected
    # ~half); a uniform draw would give them ~10%
    assert heavy > 100, (heavy, light)


def test_mixture_sample_hits_targets_and_binding_source_keeps_all(spark):
    """mixture_sample (NEW r14): the binding source (worst n/t ratio)
    keeps ALL its rows (rate exactly 1.0); every other source
    down-samples toward t_s * N / n_s; absent-from-targets sources are
    dropped; the draw is repartition-stable."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.sampling import (
        mixture_sample,
    )

    rows = (
        [(i, "web") for i in range(600)]
        + [(1000 + i, "code") for i in range(80)]
        + [(2000 + i, "books") for i in range(300)]
        + [(3000 + i, "junk") for i in range(50)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    # targets web .5 / code .2 / books .3 -> N = min(600/.5=1200,
    # 80/.2=400, 300/.3=1000) = 400: code binds and keeps all 80.
    out = mixture_sample(
        df, "source", "doc_id", {"web": 5, "code": 2, "books": 3}, seed=7
    )
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert "junk" not in counts  # weight-0 source dropped
    assert counts["code"] == 80  # binding source: rate exactly 1.0
    # web expects .5*400=200 of 600, books .3*400=120 of 300 — hash
    # draw is approximate; a generous band still separates the rates
    assert 150 <= counts["web"] <= 250, counts
    assert 90 <= counts["books"] <= 150, counts
    # repartition-stable: same membership regardless of layout
    again = mixture_sample(
        df.repartition(13), "source", "doc_id", {"web": 5, "code": 2, "books": 3}, seed=7
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
