

def test_consecutive_pairs_equals_global_lead_with_gaps(spark):
    """consecutive_pairs must reproduce lead() OVER (ORDER BY key)
    exactly — including across bucket boundaries and key gaps (empty
    buckets) — while never running an O(n) global window."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        consecutive_pairs,
    )

    rng = random.Random(7)
    # sparse keys with big gaps -> many empty buckets at width 10
    keys = sorted(rng.sample(range(0, 5000), 300))
    df = spark.createDataFrame([(k, f"v{k}") for k in keys], "k long, v string")

    got = {
        r["k"]: r["nx"]
        for r in consecutive_pairs(df, "k", "v", bucket_width=10, out_col="nx").collect()
    }
    expect = {
        r["k"]: r["nx"]
        for r in df.select("k", F.lead("v").over(Window.orderBy("k")).alias("nx")).collect()
    }
    assert got == expect


def test_sequence_funnel_gap_gate_and_dropoff(spark):
    """Greedy-first chain semantics: step binds to its earliest
    qualifying event; a step outside the gap gates the REST of the
    chain (NULLs onward); users failing step 1 are absent."""
    import datetime

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        sequence_funnel,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def ts(h):
        return t0 + datetime.timedelta(hours=h)

    rows = [
        # u1: full chain inside 24h gaps
        (1, ts(0), "signup"), (1, ts(5), "click"), (1, ts(10), "purchase"),
        # u2: click too late (>24h after signup) -> t2, t3 NULL
        (2, ts(0), "signup"), (2, ts(30), "click"), (2, ts(31), "purchase"),
        # u3: greedy binds the EARLIEST click (h1); purchase before it doesn't count
        (3, ts(0), "signup"), (3, ts(1), "click"), (3, ts(2), "click"),
        (3, ts(0.5), "purchase"),
        # u4: never signed up -> absent
        (4, ts(0), "click"), (4, ts(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in sequence_funnel(
            df, "user_id", "ts", "event_type",
            ["signup", "click", "purchase"], max_gap_seconds=86400,
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == (ts(0), ts(5), ts(10))
    assert out[2] == (ts(0), None, None)
    assert out[3] == (ts(0), ts(1), None)  # no purchase after the bound click


def test_sequence_funnel_maximal_finds_chain_greedy_misses(spark):
    """VERDICT r5 task 7: under a gap gate, greedy-first binds step 2
    to the earliest click and can kill the chain; the DP completes iff
    ANY chain exists. Also: same-instant events never chain (strict
    t' < t), and reported times are per-prefix minima."""
    import datetime as dt

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        sequence_funnel,
        sequence_funnel_maximal,
    )

    base = dt.datetime(2024, 1, 1)

    def T(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        # user 1: greedy binds click@1 -> purchase@15 outside (1, 11];
        # the DP chains signup@0 -> click@9 -> purchase@15
        (1, T(0), "signup"), (1, T(1), "click"),
        (1, T(9), "click"), (1, T(15), "purchase"),
        (2, T(0), "signup"), (2, T(5), "click"), (2, T(8), "purchase"),
        (3, T(0), "signup"), (3, T(20), "purchase"), (3, T(25), "click"),
        # user 4: click at the signup instant must NOT chain (strict >)
        (4, T(0), "signup"), (4, T(0), "click"),
        (4, T(3), "click"), (4, T(5), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["signup", "click", "purchase"]
    greedy = {r["user_id"]: r for r in
              sequence_funnel(df, "user_id", "ts", "event_type", steps, 10).collect()}
    maximal = {r["user_id"]: r for r in
               sequence_funnel_maximal(df, "user_id", "ts", "event_type", steps, 10).collect()}

    assert greedy[1]["t3"] is None            # the concession
    assert maximal[1]["t3"] == T(15)          # the DP finds it
    assert maximal[1]["t2"] == T(1)           # min feasible prefix time
    for u in (2, 3, 4):                       # agreement where greedy suffices
        assert tuple(greedy[u]) == tuple(maximal[u])
    assert maximal[4]["t2"] == T(3)           # same-instant click ignored
    # no-gap mode: feasibility degenerates to greedy for every user
    g0 = {tuple(r) for r in
          sequence_funnel(df, "user_id", "ts", "event_type", steps).collect()}
    m0 = {tuple(r) for r in
          sequence_funnel_maximal(df, "user_id", "ts", "event_type", steps).collect()}
    assert g0 == m0


def test_sequence_funnel_maximal_null_ts_never_chains(spark):
    """ADVICE r6: a NULL timestamp must behave as never-chaining (SQL
    comparison semantics), not coerce to int64-min in the pandas DP
    and fabricate an always-feasible step-1 prefix."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType, TimestampType,
    )

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        sequence_funnel_maximal,
    )

    base = dt.datetime(2024, 1, 1)
    schema = StructType([
        StructField("user_id", IntegerType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ])
    rows = [
        # user 1: the ONLY signup has NULL ts -> no feasible prefix at
        # all, despite a later click+purchase
        (1, None, "signup"),
        (1, base + dt.timedelta(seconds=5), "click"),
        (1, base + dt.timedelta(seconds=8), "purchase"),
        # user 2: NULL-ts click must not displace the real chain
        (2, base, "signup"),
        (2, None, "click"),
        (2, base + dt.timedelta(seconds=3), "click"),
        (2, base + dt.timedelta(seconds=6), "purchase"),
    ]
    df = spark.createDataFrame(rows, schema)
    steps = ["signup", "click", "purchase"]
    out = {r["user_id"]: r for r in
           sequence_funnel_maximal(df, "user_id", "ts", "event_type", steps, 10).collect()}
    assert 1 not in out  # NULL signup is not a chain start
    assert out[2]["t2"] == base + dt.timedelta(seconds=3)
    assert out[2]["t3"] == base + dt.timedelta(seconds=6)
    assert df.filter(F.col("ts").isNull()).count() == 2  # fixture sanity


def test_sequence_funnel_maximal_window_form_matches_dp(spark):
    """r16 optimization equivalence: the range-frame window form of
    sequence_funnel_maximal must reproduce the original pandas DP
    (kept as _sequence_funnel_maximal_dp) row-for-row on an
    adversarial random event soup — dense same-instant ties, events
    exactly AT the gap boundary (t' + gap, inclusive) and one past it,
    interleaved step types, users missing arbitrary steps — for k=2,
    k=3 and k=4 step chains and for gap=None (unbounded lookback)."""
    import datetime as dt
    import random

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        _sequence_funnel_maximal_dp,
        sequence_funnel_maximal,
    )

    rng = random.Random(16)
    base = dt.datetime(2024, 1, 1)
    types = ["a", "b", "c", "d", "zz"]  # step types + noise
    rows = []
    for u in range(60):
        n = rng.randint(1, 24)
        for _ in range(n):
            # coarse second grid forces frequent exact ties, and
            # offsets cluster near multiples of the gap (10 s) so
            # boundary chains (t == t' + gap) occur organically
            sec = rng.choice([0, 1, 3, 9, 10, 11, 19, 20, 21, 30, 40])
            rows.append((u, base + dt.timedelta(seconds=sec), rng.choice(types)))
    df = spark.createDataFrame(rows, ["u", "ts", "et"])

    for steps, gap in (
        (["a", "b"], 10),
        (["a", "b", "c"], 10),
        (["a", "b", "c", "d"], 10),
        (["a", "b", "c"], None),
    ):
        cols = ["u"] + [f"t{i + 1}" for i in range(len(steps))]
        got = {
            r["u"]: tuple(r[c] for c in cols[1:])
            for r in sequence_funnel_maximal(df, "u", "ts", "et", steps, gap).collect()
        }
        want = {
            r["u"]: tuple(r[c] for c in cols[1:])
            for r in _sequence_funnel_maximal_dp(
                df, "u", "ts", "et", steps, gap
            ).collect()
        }
        assert got == want, (steps, gap)


def test_cohort_retention_matrix_and_null_ts(spark):
    """Hand-computed retention triangle: cohort = first-event month,
    offset-0 row per cohort equals cohort size, entities active in a
    later month count once regardless of event multiplicity, and NULL
    timestamps contribute nothing (a NULL month is neither a cohort
    nor activity)."""
    import datetime

    from cdc_change_data_capture_pipeline_from_mysql_to_pinecone_spark.operators.relational import (
        cohort_retention,
    )

    def ts(m, d):
        return datetime.datetime(2024, m, d)

    rows = [
        # u1: joins Jan, active Jan (twice) + Mar
        (1, ts(1, 5)), (1, ts(1, 20)), (1, ts(3, 1)),
        # u2: joins Jan only
        (2, ts(1, 9)),
        # u3: joins Feb, active Feb + Mar; one NULL event ignored
        (3, ts(2, 14)), (3, ts(3, 30)), (3, None),
        # u4: NULL-only entity vanishes entirely
        (4, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort"].strftime("%Y-%m"), r["period_offset"]): r["n_active"]
        for r in cohort_retention(df, "user_id", "ts", period="month").collect()
    }
    assert got == {
        ("2024-01", 0): 2,
        ("2024-01", 2): 1,
        ("2024-02", 0): 1,
        ("2024-02", 1): 1,
    }
