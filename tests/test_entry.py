

def test_registry_priority_order():
    """The driver's correctness gate samples queries() from the front;
    the highest-information entries must occupy the leading slots and
    every priority name must resolve (the assert inside _ordered_registry
    catches typos)."""
    import __spark_entry__ as m

    names = list(m.queries())
    assert names[: len(m._PRIORITY)] == m._PRIORITY
    assert len(names) == len(set(names)) == len(m._REG)
    # spot-pin the r5 gate window: every oracle-backed query that has
    # never had a driver correctness row leads (14 as of late r5), the
    # rest of the 50 slots refresh the stalest pre-Spark-4 driver rows
    front = set(names[:50])
    for probe in ("q4_order_priority", "q22_global_sales_opportunity",
                  "vec_knn_bruteforce", "vec_ivf_trained_cells",
                  "dedup_embedding_neardup",
                  "text_tfidf_topk", "join_salted_skew",
                  "agg_cube_status_priority", "pipeline_training_data",
                  "cdc_apply_changelog", "text_source_cap",
                  "text_length_outliers", "vec_pq_codes",
                  "vec_pq_topk_adc", "vec_ivfpq_topk",
                  "incremental_join_delta", "sql_frontend_window_gsets",
                  "sql_frontend_setops", "dedup_winnow_fingerprints",
                  "dedup_winnow_candidates", "incremental_changelog_rollup",
                  "text_unigram_surprisal", "text_bpe_pair_merge",
                  "text_bigram_surprisal", "vec_pca_projection",
                  "join_interval_overlap", "join_bloom_prefilter", "ids_dense_assign", "ml_weighted_sample", "incremental_minhash_rollup", "dedup_setsim_exact", "funnel_three_step_gated", "sql_frontend_lateral", "dedup_cluster_best_survivors", "cdc_store_diff"):
        assert probe in front, probe


def test_multigrain_rollup_null_ts_grain_is_structural(spark, tmp_path):
    """Regression (ADVICE r4): the rollup's grain label derives from
    F.grouping(), not bucket NULL-ness — a NULL ts must yield ONE
    'hour' NULL-bucket row and ONE 'day' NULL-bucket row per
    event_type, never two 'day' rows (duplicate output keys)."""
    import os

    import pandas as pd

    import __spark_entry__ as m

    src = str(tmp_path / "src")
    os.makedirs(src)
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:10:00", "2024-01-01 05:10:00", pd.NaT]
            ),
            "event_type": ["click", "click", "click"],
            "value": [1.0, 2.0, 4.0],
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(os.path.join(src, "events.parquet"), index=False)

    out = m.queries()["timeseries_multigrain_rollup"](spark, src).collect()
    null_rows = [(r["grain"], r["n"], r["val_sum"]) for r in out if r["bucket_us"] is None]
    assert sorted(null_rows) == [("day", 1, 4.0), ("hour", 1, 4.0)]
    day_rows = [r for r in out if r["grain"] == "day" and r["bucket_us"] is not None]
    assert len(day_rows) == 1 and day_rows[0]["n"] == 2  # both non-null ts same day
