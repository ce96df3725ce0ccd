"""Dedup clustering: candidate pairs -> connected components ->
canonical survivors."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (  # noqa: E402
    cluster_survivors,
    connected_components,
    exact_dedup,
)


def test_connected_components_known_graph(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_components_chain_converges(spark):
    """A long chain needs multiple propagation rounds — the fixpoint
    loop must actually iterate."""
    n = 12
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
    comp = connected_components(pairs, max_iters=30).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == n + 1


def test_cluster_survivors_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 4), (4, 7), (2, 3)], "id_a long, id_b long")
    comp = connected_components(pairs)
    kept = cluster_survivors(docs, comp, "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # {0,4,7} -> 0; {2,3} -> 2; singletons 1, 5, 6 survive
    assert ids == [0, 1, 2, 5, 6]


def test_full_dedup_pipeline_on_fixture(spark, sf_dir):
    """LSH candidates -> components -> survivors over documents; the
    doubled corpus must collapse back to the original count."""
    from pyspark.sql import functions as F

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    sig = minhash_signatures(doubled, "text", "doc_id", num_hashes=16)
    pairs = lsh_candidate_pairs(sig, "doc_id", num_bands=4, rows_per_band=4)
    comp = connected_components(pairs)
    kept = cluster_survivors(doubled, comp, "doc_id")
    # identical copies always collide in every LSH band -> each copy
    # pairs with its original; survivors keep the low (original) ids
    assert kept.count() <= d.count()
    assert kept.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_winnow_shared_run_guarantee(spark):
    """Winnowing guarantee (Schleimer et al. §3): any token run of
    length >= window + k - 1 shared by two docs yields at least one
    shared fingerprint; docs with no common k-gram share none."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        winnow_candidate_pairs,
        winnow_fingerprints,
    )

    k, w = 4, 8
    shared_run = " ".join(f"run{i}" for i in range(w + k - 1))  # 11 tokens
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + shared_run + " delta epsilon zeta"),
            (2, "one two three four five " + shared_run),
            (3, "totally different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", k=k, window=w)
    rows = fps.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2], "shared 11-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])

    pairs = winnow_candidate_pairs(fps, "doc_id", min_shared=1, max_bucket_size=None)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_winnow_fingerprint_density(spark, sf_dir):
    """Winnowing keeps ~1/window of the k-gram hashes (the paper's
    2/(w+1) expected density) — the storage win over full shingling."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        winnow_fingerprints,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    n_fps = winnow_fingerprints(docs, "text", "doc_id", k=4, window=8).count()
    per_doc = n_fps / n_docs
    # ~54 tokens/doc -> ~51 kgram hashes -> expected ~2/(8+1)*51 ≈ 11
    assert 4 <= per_doc <= 25, per_doc


def test_set_similarity_join_exact_on_sparse_corpus(spark):
    """On a sparse corpus (mostly-unique vocabularies — the case
    prefix filtering exists for) the join must return exactly the
    brute-force Jaccard pairs: planted near-dups found, disjoint docs
    absent, scores exact."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        set_similarity_join,
    )

    docs = [
        (1, "aa bb cc dd ee ff gg hh ii jj"),
        (2, "aa bb cc dd ee ff gg hh ii kk"),   # J(1,2) = 9/11
        (3, "zz yy xx ww vv uu tt ss rr qq"),
        (4, "zz yy xx ww vv uu tt ss rr qq"),   # J(3,4) = 1.0
        (5, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in set_similarity_join(df, "text", "doc_id", threshold=0.8).collect()
    }
    assert got == {(1, 2): round(9 / 11, 6), (3, 4): 1.0}
    # threshold above J(1,2): only the identical pair remains
    strict = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(df, "text", "doc_id", threshold=0.9).collect()
    }
    assert strict == {(3, 4)}


def test_set_similarity_join_lossless_vs_bruteforce_on_fixture(spark, sf_dir):
    """ADVICE r13: since the r13 oracle rewrite, the DuckDB oracle
    generates candidates with the SAME prefix-filtering theorem as the
    engine, so a shared misapplication (threshold or prefix-length
    formula changed on both sides) could lose pairs undetectably. This
    test keeps candidate-generation losslessness INDEPENDENTLY gated:
    brute-force all-pairs Jaccard over the full sf0.001 documents
    fixture (driver-side python sets — 500 docs, ~125k pairs), compared
    EXACTLY (pairs and scores) against the engine's prefix-filtered
    join at the registry's threshold. Re-runs automatically if the
    fixtures ever change."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        set_similarity_join,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import load_table

    thr = 0.9  # the dedup_setsim_exact registry threshold
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in set_similarity_join(docs, "text", "doc_id", threshold=thr).collect()
    }

    rows = docs.collect()
    toks = {r["doc_id"]: set((r["text"] or "").strip().split()) for r in rows}
    ids = sorted(toks)
    want = {}
    for i, a in enumerate(ids):
        ta = toks[a]
        for b in ids[i + 1:]:
            tb = toks[b]
            inter = len(ta & tb)
            if inter == 0:
                continue
            j = inter / (len(ta) + len(tb) - inter)
            if j >= thr:
                want[(a, b)] = round(j, 9)
    assert got == want, (
        f"engine {len(got)} pairs vs brute force {len(want)}; "
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    assert want, "fixture produced zero qualifying pairs — test is vacuous"


def test_duplicated_passages_planted(spark):
    """duplicated_passages (NEW r14 — the exact-substring-dedup
    blocklist, passage level): a boilerplate n-gram embedded in three
    otherwise-unique docs is reported with its carrier count and
    lowest carrier id; within-doc repetition alone never qualifies
    (array_distinct makes each doc vote once); unique docs contribute
    nothing."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.text import (
        duplicated_passages,
    )

    boiler = "all rights reserved by the example corp"  # 7 tokens
    docs = [
        (1, f"alpha beta {boiler} gamma delta"),
        (2, f"{boiler} epsilon zeta eta theta iota"),
        (7, f"kappa lam mu nu xi {boiler}"),
        # within-doc repetition only — must NOT qualify
        (9, "rep tok rep tok rep tok rep tok rep tok rep tok rep tok"),
        (11, "totally unique words here nothing shared with anything"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["passage"]: (r["n_docs"], r["first_doc"])
        for r in duplicated_passages(df, "doc_id", "text", n=7, min_docs=2).collect()
    }
    assert out.get(boiler) == (3, 1), out
    # every reported passage is carried by >= 2 DISTINCT docs; doc 9's
    # self-repetition and doc 11's unique text produce nothing
    for passage, (n_docs, first) in out.items():
        assert n_docs >= 2
        assert "rep tok" not in passage
        assert "unique" not in passage


def test_apply_passage_blocklist_planted(spark):
    """apply_passage_blocklist (NEW r15 — the APPLY half of
    exact-substring dedup, VERDICT r14 task 1): per-doc distinct-gram
    totals, blocklist hit counts, exact coverage ratio, and the
    keep-at-threshold verdict — verified against a brute-force Python
    recount of the planted fixture. A doc made mostly of boilerplate
    drops; lightly-contaminated and clean docs keep."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.text import (
        apply_passage_blocklist,
        duplicated_passages,
    )

    boiler = "all rights reserved by the example corp"  # 7 tokens
    docs = [
        (1, f"alpha beta {boiler} gamma delta"),
        (2, f"{boiler} epsilon zeta eta theta iota"),
        # nothing BUT the boilerplate -> coverage 1.0 -> drop
        (7, boiler),
        (11, "totally unique words here nothing shared with anything"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    bl = duplicated_passages(df, "doc_id", "text", n=7, min_docs=2)
    out = {
        r["doc_id"]: (
            r["n_passages"],
            r["n_dup_passages"],
            r["dup_coverage"],
            r["keep"],
        )
        for r in apply_passage_blocklist(
            df, bl, "doc_id", "text", n=7, max_coverage=0.5
        ).collect()
    }
    # brute force: per-doc distinct 7-gram sets, blocklist = grams in
    # >= 2 docs
    def grams(t, n=7):
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    per_doc = {i: grams(t) for i, t in docs}
    from collections import Counter

    carrier = Counter(g for gs in per_doc.values() for g in gs)
    blocked = {g for g, c in carrier.items() if c >= 2}
    want = {}
    for i, gs in per_doc.items():
        dup = len(gs & blocked)
        cov = dup / len(gs)
        want[i] = (len(gs), dup, cov, cov <= 0.5)
    assert out == want, f"{out} != {want}"
    assert out[7][3] is False, "mostly-boilerplate doc must drop"
    assert out[11] == (len(per_doc[11]), 0, 0.0, True)
    # the pipeline is self-consistent: every doc appears exactly once
    assert set(out) == {i for i, _ in docs}
    # the FUSED single-scan form (passage_coverage, what the registry
    # query serves) is bit-identical to the two-operator composition —
    # the window's carriers >= min_docs test IS blocklist membership
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.text import (
        passage_coverage,
    )

    fused = {
        r["doc_id"]: (
            r["n_passages"],
            r["n_dup_passages"],
            r["dup_coverage"],
            r["keep"],
        )
        for r in passage_coverage(
            df, "doc_id", "text", n=7, min_docs=2, max_coverage=0.5
        ).collect()
    }
    assert fused == out, f"fused {fused} != join-form {out}"


def test_winnow_textless_docs_have_no_fingerprints(spark):
    """ADVICE r5: NULL/empty text must yield ZERO fingerprint rows —
    before the fix a single NULL fingerprint row per textless doc made
    every textless doc a mutual winnow "overlap" candidate."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        winnow_candidate_pairs,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, None),
            (2, None),
            (4, "real words here repeated real words here repeated again and again"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", k=4, window=8)
    rows = fps.collect()
    assert all(r["fingerprint"] is not None for r in rows)
    assert {r["doc_id"] for r in rows} == {4}
    pairs = winnow_candidate_pairs(fps, "doc_id", min_shared=1, max_bucket_size=None)
    assert pairs.count() == 0
    # empty STRING is distinct from NULL by design: word_shingles keeps
    # sub-k-token docs as their full join, so "" fingerprints as itself
    empty = spark.createDataFrame([(9, "")], ["doc_id", "text"])
    assert winnow_fingerprints(empty, "text", "doc_id", k=4, window=8).count() == 1


def _duck_labels(con, nodes, edges, **kw):
    """Run the oracle's min-label contraction CTE chain over an
    explicit node list + edge list (bypassing the LSH pipeline)."""
    import __spark_entry__ as entry

    con.execute("DROP TABLE IF EXISTS _cc_edges")
    con.execute("CREATE TABLE _cc_edges(src BIGINT, dst BIGINT)")
    if edges:
        con.executemany("INSERT INTO _cc_edges VALUES (?, ?)", edges)
    u = "SELECT * FROM (VALUES " + ",".join(f"({n})" for n in nodes) + ") t(doc_id)"
    ctes = entry._duck_minlabel_rounds_ctes(id_out="node_id", **kw)
    sql = f"""WITH u AS ({u}),
    edges AS (SELECT src, dst FROM _cc_edges
              UNION ALL SELECT dst, src FROM _cc_edges),
    {ctes}
    SELECT node_id, label FROM labels"""
    return dict(con.sql(sql).fetchall())


def _union_find(nodes, edges):
    p = {n: n for n in nodes}

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            p[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_minlabel_cte_converges_on_adversarial_graphs():
    """The dedup-cluster ORACLE's component machinery (VERDICT r10
    task 3a): Boruvka contraction + pointer-jump compression must
    reach the exact component minimum on graph shapes far nastier
    than any LSH near-dup graph — a long randomly-permuted PATH (the
    worst case for label propagation: one-jump relaxation rounds were
    measured to advance only ~2 edges/round and left a 64-node path
    unconverged after 16 rounds), sparse random graphs, cliques, and
    singletons. Compared against a union-find ground truth."""
    import random

    import duckdb

    con = duckdb.connect()
    rng = random.Random(42)

    # long path, shuffled ids — default rounds must cover it
    ids = list(range(5000))
    rng.shuffle(ids)
    path_edges = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    assert _duck_labels(con, ids, path_edges) == _union_find(ids, path_edges)

    # sparse random graph + isolated nodes + a clique, ids non-dense
    nodes = [n * 7 + 3 for n in range(800)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(500)]
    edges += [(nodes[i], nodes[j]) for i in range(790, 800) for j in range(i + 1, 800)]
    assert _duck_labels(con, nodes, edges) == _union_find(nodes, edges)

    # edgeless corpus: every node labels itself
    singles = [5, 9, 11]
    assert _duck_labels(con, singles, []) == {5: 5, 9: 9, 11: 11}


def test_minlabel_cte_matches_connected_components(spark):
    """Cross-engine: the oracle CTE and the engine's iterative
    connected_components agree on a random graph (same component
    minima), independent of the minhash/LSH candidate generation that
    normally feeds both."""
    import random

    import duckdb

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(7)
    nodes = list(range(300))
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(220)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got_spark = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    want = _union_find(nodes, edges)
    # engine labels only nodes that appear in edges
    touched = {a for e in edges for a in e}
    assert got_spark == {n: want[n] for n in touched}
    con = duckdb.connect()
    got_duck = _duck_labels(con, nodes, edges)
    assert got_duck == want


def test_minlabel_cte_convergence_guard_fires():
    """The ADVICE-r11 fixed-point guard: an under-converged run must
    raise an explicit oracle error, never return wrong labels that
    would surface as a confusing parity mismatch. rounds=1/jumps=0 on
    a long path cannot converge; the full default budget can."""
    import duckdb
    import pytest

    nodes = list(range(64))
    edges = [(i, i + 1) for i in range(63)]
    con = duckdb.connect()
    with pytest.raises(Exception, match="did not converge"):
        _duck_labels(con, nodes, edges, rounds=1, jumps=0)
    # and the default budget converges the same graph cleanly
    assert set(_duck_labels(con, nodes, edges).values()) == {0}


def test_dedup_exact_narrow_form_matches_operator(spark, sf_dir):
    """The r15 narrow-shuffle rewrite of the dedup_exact ENTRY query
    (group by md5 key + min(doc_id) — no full-text survivor struct
    crossing the exchange) must stay row-identical to the general
    exact_dedup operator composition it replaced, on the live fixture
    including the doubled-corpus shift."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    d = em._t(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1000000))
    via_operator = sorted(
        (r["doc_id"], r["fp"])
        for r in exact_dedup(doubled, "text", "doc_id")
        .select("doc_id", F.md5("text").alias("fp"))
        .collect()
    )
    via_entry = sorted(
        (r["doc_id"], r["fp"])
        for r in em.queries()["dedup_exact"](spark, sf_dir).collect()
    )
    assert via_entry == via_operator
    assert via_entry, "fixture produced zero rows — test is vacuous"
