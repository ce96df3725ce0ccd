"""Vector-index connector contract (S8 as a pluggable sink): batching,
retry-with-backoff, partition parallelism, streaming integration.
Fakes are filesystem-backed — foreachPartition bodies run in separate
Python worker processes, so in-memory fakes would observe nothing."""

from __future__ import annotations

import json
import os
import sys
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_sink import (  # noqa: E402
    foreach_batch_vector_upsert,
    iter_batches,
    send_with_retry,
)


def _dir_upsert(out_dir: str, fail_first: bool = False):
    """An upsert callable recording each delivered batch as one JSON
    file; optionally fails the first attempt per batch (transient
    error injection via marker files)."""

    def upsert(batch: list[dict]) -> None:
        key = "-".join(str(r["id"]) for r in batch)
        marker = os.path.join(out_dir, f".tried-{abs(hash(key))}")
        if fail_first and not os.path.exists(marker):
            open(marker, "w").close()
            raise ConnectionError("transient index error")
        name = f"batch-{uuid.uuid4().hex[:12]}.json"
        with open(os.path.join(out_dir, name), "w") as fh:
            json.dump(batch, fh)

    return upsert


def test_iter_batches_shapes():
    batches = list(iter_batches(iter(range(25)), 10))
    assert [len(b) for b in batches] == [10, 10, 5]
    assert list(iter_batches(iter([]), 10)) == []


def test_send_with_retry_gives_up():
    calls = []

    def always_fails(batch):
        calls.append(1)
        raise TimeoutError("down")

    with pytest.raises(TimeoutError):
        send_with_retry(always_fails, [{"id": 1}], max_retries=3, backoff_seconds=0.001)
    assert len(calls) == 3


def test_foreach_batch_delivers_all_rows_in_reference_batches(spark, tmp_path):
    out = str(tmp_path / "index")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(f"doc#{i}", [float(i), 0.5], {"source": "documents"}) for i in range(57)],
        "id string, values array<double>, metadata map<string,string>",
    ).repartition(4)
    foreach_batch_vector_upsert(df, epoch_id=0, upsert=_dir_upsert(out), batch_size=10)

    batches = [
        json.load(open(os.path.join(out, f))) for f in os.listdir(out) if f.endswith(".json")
    ]
    ids = sorted(r["id"] for b in batches for r in b)
    assert ids == sorted(f"doc#{i}" for i in range(57))  # nothing lost or duplicated
    assert max(len(b) for b in batches) <= 10  # ≙ service.py:151 batch size
    # payload shape ≙ service.py:160-166
    sample = batches[0][0]
    assert set(sample) == {"id", "values", "metadata"} and sample["metadata"]["source"] == "documents"


def test_foreach_batch_retries_transient_failures(spark, tmp_path):
    out = str(tmp_path / "index")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(f"doc#{i}", [1.0], {"k": "v"}) for i in range(20)],
        "id string, values array<double>, metadata map<string,string>",
    ).repartition(2)
    foreach_batch_vector_upsert(
        df, 0, _dir_upsert(out, fail_first=True), batch_size=10, backoff_seconds=0.001
    )
    batches = [
        json.load(open(os.path.join(out, f))) for f in os.listdir(out) if f.endswith(".json")
    ]
    ids = sorted(r["id"] for b in batches for r in b)
    assert ids == sorted(f"doc#{i}" for i in range(20))
    assert any(f.startswith(".tried-") for f in os.listdir(out))  # failures actually happened


def test_streaming_into_vector_connector(spark, sf_dir, tmp_path):
    """The full reference dataflow with the pluggable sink: stream ->
    chunk -> foreachBatch connector -> 'index' (directory fake)."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators import cdc

    out = str(tmp_path / "index")
    os.makedirs(out)
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    upsert = _dir_upsert(out)

    def process(batch_df, eid):
        from pyspark.sql import functions as F

        serialized = cdc.serialize_rows(batch_df.drop("ts"))
        chunks = cdc.chunk_documents(
            serialized, "event_id", "data_string", "events", bucket_width=100_000
        )
        payload = chunks.select(
            F.col("chunk_id").alias("id"),
            F.array(F.lit(0.0)).alias("values"),
            F.create_map(F.lit("text"), F.col("document")).alias("metadata"),
        )
        foreach_batch_vector_upsert(payload, eid, upsert, batch_size=3)

    q = stream.writeStream.foreachBatch(process).trigger(availableNow=True).start()
    q.awaitTermination(120)

    batches = [
        json.load(open(os.path.join(out, f))) for f in os.listdir(out) if f.endswith(".json")
    ]
    ids = sorted(r["id"] for b in batches for r in b)
    assert len(ids) == 10 and len(set(ids)) == 10  # 1000 events / 100-row chunks
    assert all(i.startswith("events#") for i in ids)


def test_vector_store_facade_end_to_end(spark, tmp_path):
    """The reference-shaped index API: upsert -> query(exact & ann) ->
    fetch -> overwrite-by-id -> delete, with stats maintained and the
    self-query always ranking itself first."""
    import numpy as np

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 8
    rng = np.random.RandomState(3)
    vecs = rng.randn(30, dim)
    store = VectorStore(spark, str(tmp_path / "idx"), dim=dim)
    recs = [
        {"id": f"doc{i}", "values": [float(x) for x in vecs[i]], "metadata": f"m{i}"}
        for i in range(30)
    ]
    assert store.upsert(recs) > 0
    assert store.stats()["count"] == 30

    q = [float(x) for x in vecs[7]]
    top = store.query(q, top_k=3).collect()
    assert top[0]["id"] == "doc7" and top[0]["metadata"] == "m7"
    assert abs(top[0]["score"] - 1.0) < 1e-6

    ann = store.query(q, top_k=3, mode="ann", multi_probe=1).collect()
    assert ann and ann[0]["id"] == "doc7"

    got = {r["id"] for r in store.fetch(["doc3", "doc9", "nope"]).collect()}
    assert got == {"doc3", "doc9"}

    # overwrite-by-id: second call wins
    store.upsert([{"id": "doc7", "values": [1.0] + [0.0] * (dim - 1), "metadata": "new"}])
    assert store.stats()["count"] == 30
    assert store.fetch(["doc7"]).collect()[0]["metadata"] == "new"

    assert store.delete(["doc7", "doc8"]) > 0
    assert store.stats()["count"] == 28
    assert store.fetch(["doc7"]).count() == 0
    assert store.query(q, top_k=3).collect()[0]["id"] != "doc7"


def test_vector_store_empty_edges(spark, tmp_path):
    """Review fixes: empty-list upsert/delete/fetch are no-ops, and a
    store whose EVERY row was deleted still reads as an empty frame
    (persisted schema) instead of a parquet inference failure."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 4
    store = VectorStore(spark, str(tmp_path / "idx2"), dim=dim)
    assert store.upsert([]) == 0
    assert store.delete([]) == 0
    ids = [f"d{i}" for i in range(5)]
    store.upsert([{"id": i, "values": [1.0, 0.0, 0.0, 0.0]} for i in ids])
    assert store.fetch([]).count() == 0
    assert store.delete(ids) > 0
    assert store.stats()["count"] == 0
    assert store.fetch(ids).count() == 0          # empty-store read path
    assert store.query([1.0, 0, 0, 0], top_k=3).count() == 0


def test_vector_store_concurrent_upserts_serialize(spark, tmp_path):
    """VERDICT r5 task 5: the table writer lock makes interleaved
    upserts from two threads serialize — every call stamps a DISTINCT
    version, and the final state of every id comes from the single
    highest-version call (no torn merges, no max_by ties)."""
    import threading

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 4
    path = str(tmp_path / "cidx")
    store = VectorStore(spark, path, dim=dim)
    ids = [f"d{i}" for i in range(12)]
    calls_per_thread = 3
    errors = []

    def writer(tag: str):
        try:
            for it in range(calls_per_thread):
                store.upsert(
                    [
                        {"id": i, "values": [1.0, 0.0, 0.0, 0.0],
                         "metadata": f"{tag}-{it}"}
                        for i in ids
                    ]
                )
        except Exception as e:  # surface across the thread boundary
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in ("t1", "t2")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    rows = spark.read.parquet(path).collect()
    n_calls = 2 * calls_per_thread
    assert len(rows) == len(ids)
    # every id's survivor carries the FINAL version: each call got a
    # distinct stamp (lock around read-increment-write) and each later
    # call fully overwrote the overlapping ids (lock around the merge)
    assert {r["_ver"] for r in rows} == {n_calls}
    assert len({r["metadata"] for r in rows}) == 1
    with open(f"{path}/_verseq") as fh:
        assert int(fh.read()) == n_calls


def test_vector_store_schema_evolution(spark, tmp_path):
    """A later upsert batch carrying a NEW metadata column evolves the
    store: earlier records read NULL for it, fetch/query keep
    working, and a batch missing the column still merges."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    store = VectorStore(spark, str(tmp_path / "evo_idx"), dim=4)
    store.upsert([{"id": f"d{i}", "values": [1.0, 0.0, 0.0, 0.0]} for i in range(6)])
    store.upsert([{"id": "d1", "values": [0.0, 1.0, 0.0, 0.0], "source": "web"}])
    got = {r["id"]: r.asDict().get("source") for r in store.fetch(["d0", "d1"]).collect()}
    assert got == {"d0": None, "d1": "web"}
    top = store.query([0.0, 1.0, 0.0, 0.0], top_k=1).collect()
    assert top[0]["id"] == "d1" and top[0]["source"] == "web"
    store.upsert([{"id": "d2", "values": [0.5, 0.5, 0.0, 0.0]}])  # pre-evolution shape
    assert store.fetch(["d2"]).collect()[0].asDict().get("source") is None


def test_vector_store_hybrid_query(spark, tmp_path):
    """Hybrid search (the hosted-store verb): RRF fusion of the exact
    vector ranking with a BM25 ranking over the metadata text. A doc
    that is mediocre on BOTH lists must outrank docs that only one
    retriever likes; missing query_terms / text column raise."""
    import pytest

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    store = VectorStore(spark, str(tmp_path / "hy_idx"), dim=4)
    store.upsert([
        # vector-perfect, lexically irrelevant
        {"id": "vec_only", "values": [1.0, 0.0, 0.0, 0.0], "metadata": "nothing relevant here"},
        # lexically perfect, orthogonal vector
        {"id": "lex_only", "values": [0.0, 0.0, 0.0, 1.0],
         "metadata": "spark engine spark engine spark"},
        # decent on both
        {"id": "both", "values": [0.9, 0.1, 0.0, 0.0], "metadata": "spark joins and scans"},
        {"id": "neither", "values": [0.0, 0.0, 1.0, 0.0], "metadata": "filler words only"},
    ])
    out = store.query(
        [1.0, 0.0, 0.0, 0.0], top_k=3, mode="hybrid", query_terms=["spark", "engine"]
    ).collect()
    ids = [r["id"] for r in out]
    # RRF sums (k=60): lex_only = 1/63 (vec rank 3, zero-cos tie broken
    # by id) + 1/61 (lex rank 1) ≈ .03227; both = 1/62 + 1/62 ≈ .03226;
    # vec_only = 1/61 + 0 ≈ .01639 — the two cross-retriever docs must
    # lead, the single-retriever champion trails them, 'neither' drops
    assert set(ids[:2]) == {"both", "lex_only"}
    assert ids[2] == "vec_only" and "neither" not in ids
    with pytest.raises(ValueError, match="query_terms"):
        store.query([1.0, 0, 0, 0], mode="hybrid")


def test_vector_store_namespaces(spark, tmp_path):
    """Namespaces (the reference's namespace='task1' upsert verb):
    isolated tables per namespace — same ids coexist, queries and
    deletes scope to their namespace, the default namespace is the
    root table unchanged, and stats() reports the per-namespace
    breakdown."""
    import pytest

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    store = VectorStore(spark, str(tmp_path / "ns_idx"), dim=4)
    store.upsert([{"id": "d1", "values": [1.0, 0.0, 0.0, 0.0], "metadata": "root"}])
    store.upsert(
        [{"id": "d1", "values": [0.0, 1.0, 0.0, 0.0], "metadata": "t1"},
         {"id": "d2", "values": [0.0, 0.9, 0.1, 0.0], "metadata": "t1b"}],
        namespace="task1",
    )
    assert store.namespaces() == ["", "task1"]
    # same id, different content per namespace
    assert store.fetch(["d1"]).collect()[0]["metadata"] == "root"
    assert store.fetch(["d1"], namespace="task1").collect()[0]["metadata"] == "t1"
    # queries scope to the namespace
    top = store.query([0.0, 1.0, 0.0, 0.0], top_k=1, namespace="task1").collect()
    assert top[0]["id"] == "d1" and top[0]["metadata"] == "t1"
    assert store.query([1.0, 0, 0, 0], top_k=1).collect()[0]["metadata"] == "root"
    # stats breakdown (describe_index_stats shape)
    s = store.stats()
    assert s["namespaces"][""]["count"] == 1
    assert s["namespaces"]["task1"]["count"] == 2
    assert store.stats(namespace="task1")["count"] == 2
    # deletes scope too; root untouched
    store.delete(["d1"], namespace="task1")
    assert store.fetch(["d1"], namespace="task1").count() == 0
    assert store.fetch(["d1"]).count() == 1
    with pytest.raises(ValueError, match="namespace"):
        store.upsert([{"id": "x", "values": [0.0, 0.0, 0.0, 1.0]}], namespace="../evil")


def test_vector_store_query_metadata_filter(spark, tmp_path):
    """The hosted API's metadata filter: a `where` predicate restricts
    the candidate set BEFORE ranking, so the top-k comes entirely from
    matching records (post-filtering a hit list would instead return
    fewer than k); works in exact and ann modes."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    store = VectorStore(spark, str(tmp_path / "f_idx"), dim=4)
    store.upsert([
        {"id": f"w{i}", "values": [1.0 - i * 0.01, i * 0.01, 0.0, 0.0], "src": "web"}
        for i in range(5)
    ] + [
        {"id": f"b{i}", "values": [1.0, 0.0, 0.0, 0.0], "src": "books"}
        for i in range(3)
    ])
    q = [1.0, 0.0, 0.0, 0.0]
    # unfiltered: the exact-match books rows dominate
    assert store.query(q, top_k=3).collect()[0]["id"].startswith("b")
    # filtered: every hit is web, and we still get a FULL top-3
    hits = store.query(q, top_k=3, where="src = 'web'").collect()
    assert len(hits) == 3 and all(r["src"] == "web" for r in hits)
    assert hits[0]["id"] == "w0"
    ann = store.query(q, top_k=2, mode="ann", where="src = 'web'").collect()
    assert ann and all(r["src"] == "web" for r in ann)


def test_vector_store_maintained_ivf(spark, tmp_path):
    """r7 (VERDICT r6 task 6 motivation): build_ivf trains once; after
    that every upsert/delete maintains the (id, cell) map in the same
    locked commit, so query(mode='ivf') serves CURRENT data without a
    rebuild. The map must always equal a one-shot re-assignment of the
    live corpus against the stored centroids (tick == recompute)."""
    import numpy as np

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.vectors import (
        ivf_assign,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 6
    rng = np.random.RandomState(11)
    vecs = rng.randn(40, dim)
    store = VectorStore(spark, str(tmp_path / "ivf_idx"), dim=dim)
    store.upsert([
        {"id": f"v{i}", "values": [float(x) for x in vecs[i]], "metadata": f"m{i}"}
        for i in range(40)
    ])
    assert store.build_ivf(k=4, iters=2) == 40

    def map_equals_recompute():
        tpath = store._at("")
        cents = store._ivf_centroids(tpath)
        live = store._table("").select("id", "values")
        oneshot = {r["id"]: r["cell"]
                   for r in ivf_assign(live, "id", "values", cents).collect()}
        stored = {r["id"]: r["cell"]
                  for r in spark.read.parquet(store._ivf_map_path(tpath)).collect()}
        assert stored == oneshot

    map_equals_recompute()

    # with every cell probed, ivf == exact (recall 1)
    q = [float(x) for x in vecs[13]]
    exact = [r["id"] for r in store.query(q, top_k=5).collect()]
    ivf_all = [r["id"] for r in store.query(q, top_k=5, mode="ivf", n_probe=4).collect()]
    assert ivf_all == exact
    # 1-probe finds the self-match (its cell is the query's best cell)
    assert store.query(q, top_k=1, mode="ivf", n_probe=1).collect()[0]["id"] == "v13"

    # fresh upsert is served WITHOUT rebuild: a near-duplicate of the
    # query vector must rank first in ivf mode
    near = [x + 1e-3 for x in q]
    store.upsert([{"id": "fresh", "values": near, "metadata": "new"}])
    map_equals_recompute()
    hits = [r["id"] for r in store.query(q, top_k=2, mode="ivf", n_probe=1).collect()]
    assert "fresh" in hits

    # moved vector flips its cell via last-writer-wins
    store.upsert([{"id": "v13", "values": [-x for x in q], "metadata": "moved"}])
    map_equals_recompute()

    # delete drops the id from the map in the same commit
    store.delete(["fresh"])
    tpath = store._at("")
    ids = {r["id"] for r in spark.read.parquet(store._ivf_map_path(tpath)).collect()}
    assert "fresh" not in ids and len(ids) == 40
    assert all(r["id"] != "fresh"
               for r in store.query(q, top_k=5, mode="ivf", n_probe=4).collect())

    # ivf on a store without build_ivf raises
    other = VectorStore(spark, str(tmp_path / "no_ivf"), dim=dim)
    other.upsert([{"id": "a", "values": [1.0] * dim}])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="build_ivf"):
        other.query([1.0] * dim, mode="ivf")


def test_vector_store_ivf_map_crash_catchup(spark, tmp_path):
    """r7 review catch: table swap and map swap are two commits; a
    crash between them must leave a RECOVERABLE map, not a silently
    stale one. The map's _map_ver watermark lags the table's _verseq
    after such a crash, and the next mutation's catch-up path
    re-assigns every row stamped past it (and semi-joins away ids a
    lost delete tick removed)."""
    import numpy as np

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.vectors import (
        ivf_assign,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 4
    rng = np.random.RandomState(5)
    vecs = rng.randn(20, dim)
    store = VectorStore(spark, str(tmp_path / "crash_idx"), dim=dim)
    store.upsert([
        {"id": f"v{i}", "values": [float(x) for x in vecs[i]]} for i in range(20)
    ])
    store.build_ivf(k=3, iters=1)
    tpath = store._at("")

    def stored_map():
        return {r["id"]: r["cell"]
                for r in spark.read.parquet(store._ivf_map_path(tpath)).collect()}

    def recompute():
        cents = store._ivf_centroids(tpath)
        live = store._table("").select("id", "values")
        return {r["id"]: r["cell"]
                for r in ivf_assign(live, "id", "values", cents).collect()}

    # crash AFTER the table commit, BEFORE the map commit
    real_commit = store._commit_ivf_map
    store._commit_ivf_map = lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    import pytest as _pytest
    with _pytest.raises(OSError):
        store.upsert([{"id": "missed", "values": [9.0, 0.0, 0.0, 0.0]}])
    store._commit_ivf_map = real_commit
    assert "missed" in {r["id"] for r in store.fetch(["missed"]).collect()}
    assert "missed" not in stored_map()          # the stale window

    # the next ordinary tick heals the miss via the watermark catch-up
    store.upsert([{"id": "later", "values": [0.0, 9.0, 0.0, 0.0]}])
    m = stored_map()
    assert "missed" in m and "later" in m
    assert m == recompute()

    # lost DELETE tick: crash between delete_keys and the map commit
    store._commit_ivf_map = lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    with _pytest.raises(OSError):
        store.delete(["v3"])
    store._commit_ivf_map = real_commit
    assert store.fetch(["v3"]).count() == 0      # table committed
    assert "v3" in stored_map()                  # map stale
    store.upsert([{"id": "heal", "values": [0.0, 0.0, 9.0, 0.0]}])
    m = stored_map()
    assert "v3" not in m and m == recompute()


def _ivf_probe_kind(df):
    """'table' when the probe pushes the TABLE's `_cell` column (fast
    path), 'map' when it pushes the map's `cell` (fallback) — path
    strings are elided in plan text, so the pushed-filter column name
    is the reliable discriminator. Handles both In(...) and the
    single-probe EqualTo(...) forms."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = " ".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    if "(_cell" in pushed:
        return "table"
    if "(cell," in pushed or "(cell)" in pushed:
        return "map"
    return "none"


def test_vector_store_ivf_cell_clustered_probe(spark, tmp_path):
    """r8 (VERDICT r7 item 2): the IVF probe's I/O must match its
    ~n_probe/k claim, not just its compute. build_ivf stamps `_cell`
    on every row and the keyed-table writes cluster each bucket's
    files by it, so the probe is a pushed `IN` over a sorted column —
    row-group min/max stats prune the un-probed cells' bytes. Checked
    here at the layers fixture scale can see: the column rides the
    rows, every data file is sorted by `_cell` (tight row-group stats
    at any future row-group count), the predicate reaches the parquet
    scan as a PushedFilter, and the probed query stays correct."""
    import numpy as np
    import pyarrow.parquet as pq

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 8
    rng = np.random.RandomState(11)
    vecs = rng.randn(400, dim)
    store = VectorStore(spark, str(tmp_path / "cell_idx"), dim=dim)
    store.upsert([
        {"id": f"v{i}", "values": [float(x) for x in vecs[i]]} for i in range(400)
    ])
    store.build_ivf(k=4, iters=1)
    tpath = store._at("")

    t = store._table("")
    assert "_cell" in t.columns
    # table cells == committed map (same quantizer, same rows)
    tbl = {r["id"]: r["_cell"] for r in t.select("id", "_cell").collect()}
    amap = {r["id"]: r["cell"]
            for r in spark.read.parquet(store._ivf_map_path(tpath)).collect()}
    assert tbl == amap and len(tbl) == 400

    def assert_cell_sorted():
        import os as _os
        n_files = 0
        for root, dirs, files in _os.walk(tpath):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                cells = pq.read_table(
                    _os.path.join(root, f), columns=["_cell"]
                )["_cell"].to_pylist()
                assert cells == sorted(cells), (f, cells[:20])
                n_files += 1
        assert n_files > 0

    assert_cell_sorted()

    # the probe predicate reaches the scan (pushed, row-group-prunable)
    q = [float(x) for x in vecs[0]]
    hits = store.query(q, top_k=5, mode="ivf", n_probe=1)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "_cell" in "".join(pushed), plan
    # and NO join against the map in the fast path — the probe pushes
    # the TABLE's `_cell`, never the map's `cell`
    assert _ivf_probe_kind(hits) == "table", plan

    # incremental upserts keep cells + clustering fresh
    more = rng.randn(50, dim)
    store.upsert([
        {"id": f"w{i}", "values": [float(x) for x in more[i]]} for i in range(50)
    ])
    t2 = store._table("")
    assert t2.filter("_cell IS NULL").count() == 0
    assert_cell_sorted()

    # probing every cell == exact search (recall 1 sanity)
    exact = [r["id"] for r in store.query(q, top_k=5, mode="exact").collect()]
    full = [r["id"] for r in store.query(q, top_k=5, mode="ivf", n_probe=4).collect()]
    assert exact == full


def test_vector_store_ivf_rowgroup_pruning(spark, tmp_path):
    """The cell-clustered layout must actually prune: with row groups
    forced small (so one bucket file holds several), a 1-of-4-cell
    probe's pushed predicate intersects a strict subset of row groups
    by footer min/max — the byte-level decision the claim rides at
    scale, measured the way test_layout measures file pruning."""
    import numpy as np
    import pyarrow.parquet as pq

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 4096)
    try:
        dim = 8
        rng = np.random.RandomState(13)
        vecs = rng.randn(4000, dim)
        store = VectorStore(spark, str(tmp_path / "rg_idx"), dim=dim)
        store.upsert([
            {"id": f"v{i}", "values": [float(x) for x in vecs[i]]}
            for i in range(4000)
        ])
        store.build_ivf(k=4, iters=1)
        tpath = store._at("")

        import os as _os
        total = touched = multi_rg_files = 0
        probe = {0}
        for root, dirs, files in _os.walk(tpath):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(_os.path.join(root, f)).metadata
                if md.num_row_groups > 1:
                    multi_rg_files += 1
                ci = {c: i for i in range(md.num_columns)
                      for c in [md.row_group(0).column(i).path_in_schema]}
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci["_cell"]).statistics
                    total += 1
                    if st is None or st.min <= max(probe) and st.max >= min(probe):
                        if st is None or any(st.min <= c <= st.max for c in probe):
                            touched += 1
        assert multi_rg_files > 0, "row groups did not split; raise fixture size"
        assert touched < total, (touched, total)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)


def test_vector_store_delete_crash_heal(spark, tmp_path):
    """ADVICE r7 (medium): delete() must run the same watermark
    catch-up as upsert. If a prior tick crashed between its table
    commit and its map commit, a bare anti-join-and-commit at the new
    version would advance the watermark past the missed rows FOREVER.
    And (low) the verseq bump must precede delete_keys, so a crash
    anywhere inside the mutation leaves watermark lag for the next
    tick to heal."""
    import numpy as np
    import pytest as _pytest

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.vectors import (
        ivf_assign,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 4
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, dim)
    store = VectorStore(spark, str(tmp_path / "dcrash_idx"), dim=dim)
    store.upsert([
        {"id": f"v{i}", "values": [float(x) for x in vecs[i]]} for i in range(20)
    ])
    store.build_ivf(k=3, iters=1)
    tpath = store._at("")

    def stored_map():
        return {r["id"]: r["cell"]
                for r in spark.read.parquet(store._ivf_map_path(tpath)).collect()}

    def recompute():
        cents = store._ivf_centroids(tpath)
        live = store._table("").select("id", "values")
        return {r["id"]: r["cell"]
                for r in ivf_assign(live, "id", "values", cents).collect()}

    # crash an upsert AFTER the table commit, BEFORE the map commit
    real_commit = store._commit_ivf_map
    store._commit_ivf_map = lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    with _pytest.raises(OSError):
        store.upsert([{"id": "missed", "values": [9.0, 0.0, 0.0, 0.0]}])
    store._commit_ivf_map = real_commit
    assert "missed" not in stored_map()

    # the next mutation is a DELETE of other ids: it must heal the
    # missed row, drop the deleted ones, and land map == recompute
    store.delete(["v1", "v2"])
    m = stored_map()
    assert "missed" in m, "delete() advanced the watermark past a missed upsert"
    assert "v1" not in m and "v2" not in m
    assert m == recompute()

    # verseq-before-merge ordering: a crash INSIDE the table mutation
    # (after delete_keys committed) still leaves watermark lag, so the
    # next tick prunes the ghost ids from the map
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (
        vector_store as vs_mod,
    )

    real_delete_keys = vs_mod.delete_keys

    def delete_then_crash(*a, **k):
        real_delete_keys(*a, **k)
        raise OSError("crash after table commit")

    vs_mod.delete_keys = delete_then_crash
    with _pytest.raises(OSError):
        store.delete(["v5"])
    vs_mod.delete_keys = real_delete_keys
    assert store.fetch(["v5"]).count() == 0     # table committed
    assert "v5" in stored_map()                 # map stale, but lagged
    store.upsert([{"id": "heal2", "values": [0.0, 9.0, 0.0, 0.0]}])
    m = stored_map()
    assert "v5" not in m and m == recompute()


def test_vector_store_where_composes_with_ivf_fast_path(spark, tmp_path):
    """r8: the metadata `where` filter must compose with the `_cell`
    fast-path probe (both predicates in ONE scan, filter-before-rank
    semantics preserved) and with mode='hybrid' — a filtered probe
    still returns a FULL top-k drawn from matching rows only."""
    import numpy as np

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 4
    rng = np.random.RandomState(3)
    store = VectorStore(spark, str(tmp_path / "wc_idx"), dim=dim)
    rows = []
    for i in range(60):
        v = rng.randn(dim)
        rows.append({
            "id": f"r{i}",
            "values": [float(x) for x in v],
            "src": "web" if i % 2 == 0 else "books",
            "metadata": f"doc {i} filter hash join terms",
        })
    store.upsert(rows)
    store.build_ivf(k=3, iters=1)
    q = [float(x) for x in rng.randn(dim)]

    hits = store.query(q, top_k=4, mode="ivf", n_probe=3, where="src = 'web'")
    got = hits.collect()
    assert len(got) == 4 and all(r["src"] == "web" for r in got)
    # probing ALL cells with the filter == exact search over the
    # filtered population (recall-1 check through the fast path)
    exact = store.query(q, top_k=4, mode="exact", where="src = 'web'").collect()
    assert [r["id"] for r in got] == [r["id"] for r in exact]
    # and the fast path really ran: the probe pushes the table's
    # `_cell`, not the map's `cell`
    assert _ivf_probe_kind(hits) == "table"

    hy = store.query(
        q, top_k=3, mode="hybrid", query_terms=["filter", "hash"],
        where="src = 'books'",
    ).collect()
    assert len(hy) == 3 and all(r["src"] == "books" for r in hy)


def test_vector_store_rebuild_crash_disables_cell_fast_path(spark, tmp_path):
    """r8 self-review catch: a build_ivf crash BETWEEN its table
    re-stamp and its map swap leaves NEW-quantizer cells in the rows
    while the committed centroids are OLD — and a later ordinary
    tick's catch-up makes the watermark current again, so the
    watermark gate alone would let the `_cell` fast path probe
    old-centroid cells against new-centroid row values (silent
    recall loss). The rebuild-pending marker must keep the fast path
    OFF (quantizer-consistent map-join fallback) across that whole
    window, and a clean rebuild must clear it."""
    import numpy as np
    import pytest as _pytest

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    dim = 4
    rng = np.random.RandomState(17)
    store = VectorStore(spark, str(tmp_path / "rb_idx"), dim=dim)
    store.upsert([
        {"id": f"v{i}", "values": [float(x) for x in rng.randn(dim)]}
        for i in range(30)
    ])
    store.build_ivf(k=3, iters=1)
    tpath = store._at("")
    q = [float(x) for x in rng.randn(dim)]

    # sanity: clean build serves through the fast path (no map join)
    assert _ivf_probe_kind(store.query(q, top_k=5, mode="ivf", n_probe=3)) == "table"

    # grow the corpus, then CRASH a rebuild after its table re-stamp
    store.upsert([
        {"id": f"w{i}", "values": [float(x) for x in rng.randn(dim)]}
        for i in range(10)
    ])
    real_commit = store._commit_ivf_map
    store._commit_ivf_map = lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    with _pytest.raises(OSError):
        store.build_ivf(k=3, iters=1)
    store._commit_ivf_map = real_commit
    import os as _os
    assert _os.path.exists(store._rebuild_pending_path(tpath))

    # an ordinary tick heals the WATERMARK (its catch-up path) — the
    # dangerous state the marker exists for
    store.upsert([{"id": "later", "values": [0.0, 9.0, 0.0, 0.0]}])
    assert store._ivf_map_ver(store._ivf_map_path(tpath)) == store._current_version(tpath)

    # fast path must STILL be off: the executed plan joins the map
    hits = store.query(q, top_k=5, mode="ivf", n_probe=3)
    # the fallback probes the MAP's `cell` column, never the table's
    assert _ivf_probe_kind(hits) == "map"
    # and with every cell probed, results equal exact search — the
    # fallback is quantizer-consistent even mid-window
    exact = [r["id"] for r in store.query(q, top_k=5, mode="exact").collect()]
    assert [r["id"] for r in hits.collect()] == exact

    # a clean rebuild clears the marker and restores the fast path
    store.build_ivf(k=3, iters=1)
    assert not _os.path.exists(store._rebuild_pending_path(tpath))
    hits2 = store.query(q, top_k=5, mode="ivf", n_probe=3)
    assert _ivf_probe_kind(hits2) == "table"
    assert [r["id"] for r in hits2.collect()] == exact


def test_vector_store_stats_include_cells(spark, tmp_path):
    """r8: stats(include_cells=True) reports the maintained IVF
    occupancy from the committed map — totals match the corpus, stay
    fresh across upsert/delete, and the flag is a no-op without a
    built index."""
    import numpy as np

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    rng = np.random.RandomState(23)
    store = VectorStore(spark, str(tmp_path / "st_idx"), dim=4)
    store.upsert([
        {"id": f"v{i}", "values": [float(x) for x in rng.randn(4)]}
        for i in range(40)
    ])
    assert "cells" not in store.stats(include_cells=True)  # no index yet
    store.build_ivf(k=3, iters=1)
    st = store.stats(include_cells=True)
    assert sum(st["cells"].values()) == 40 and len(st["cells"]) <= 3
    store.delete(["v0", "v1"])
    store.upsert([{"id": "w0", "values": [1.0, 0.0, 0.0, 0.0]}])
    st2 = store.stats(include_cells=True)
    assert sum(st2["cells"].values()) == 39
    assert "cells" not in store.stats()  # default shape unchanged


def test_vector_store_fetch_large_batch_semijoin(spark, tmp_path):
    """r8: fetch() with a batch larger than FETCH_IN_LIST_MAX filters
    via broadcast semi-join (O(1) plan size) instead of a literal IN
    list — same rows either way, bucket pruning still applied."""
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    store = VectorStore(spark, str(tmp_path / "fb_idx"), dim=2)
    store.upsert([
        {"id": f"v{i}", "values": [float(i), 0.0]} for i in range(50)
    ])
    big = [f"v{i}" for i in range(40)] + [f"missing{i}" for i in range(5)]
    old = VectorStore.FETCH_IN_LIST_MAX
    try:
        VectorStore.FETCH_IN_LIST_MAX = 10  # force the semi-join path
        got = store.fetch(big)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan, plan
        rows = {r["id"] for r in got.collect()}
    finally:
        VectorStore.FETCH_IN_LIST_MAX = old
    small = {r["id"] for r in store.fetch(big).collect()}  # IN-list path
    assert rows == small == {f"v{i}" for i in range(40)}


def test_vector_store_rebuild_crash_before_rewrite(spark, tmp_path):
    """Completing the rebuild-crash matrix: a crash AFTER the pending
    marker but BEFORE the table re-stamp commits leaves table, cells,
    and map all on the old quantizer — the conservative gate still
    disables the fast path (marker present), the fallback serves
    correct old-quantizer results, and a clean rebuild restores the
    fast path."""
    import numpy as np
    import pytest as _pytest

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources import (
        vector_store as vs_mod,
    )
    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.sources.vector_store import (
        VectorStore,
    )

    rng = np.random.RandomState(19)
    store = VectorStore(spark, str(tmp_path / "rb2_idx"), dim=4)
    store.upsert([
        {"id": f"v{i}", "values": [float(x) for x in rng.randn(4)]}
        for i in range(25)
    ])
    store.build_ivf(k=3, iters=1)
    tpath = store._at("")
    q = [float(x) for x in rng.randn(4)]

    real_upsert = vs_mod.upsert_parquet_partitioned

    def crash(*a, **k):
        raise OSError("crash before table rewrite")

    vs_mod.upsert_parquet_partitioned = crash
    with _pytest.raises(OSError):
        store.build_ivf(k=3, iters=1)
    vs_mod.upsert_parquet_partitioned = real_upsert
    import os as _os
    assert _os.path.exists(store._rebuild_pending_path(tpath))

    hits = store.query(q, top_k=5, mode="ivf", n_probe=3)
    assert _ivf_probe_kind(hits) == "map"
    exact = [r["id"] for r in store.query(q, top_k=5, mode="exact").collect()]
    assert [r["id"] for r in hits.collect()] == exact

    store.build_ivf(k=3, iters=1)
    assert not _os.path.exists(store._rebuild_pending_path(tpath))
    assert _ivf_probe_kind(store.query(q, top_k=5, mode="ivf", n_probe=3)) == "table"
