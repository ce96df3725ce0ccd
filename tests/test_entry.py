

def test_registry_priority_order():
    """The driver's correctness gate samples queries() from the front;
    the highest-information entries must occupy the leading slots and
    every priority name must resolve (the assert inside _ordered_registry
    catches typos)."""
    import __spark_entry__ as m

    names = list(m.queries())
    assert names[: len(m._PRIORITY)] == m._PRIORITY
    assert len(names) == len(set(names)) == len(m._REG)
    # spot-pin the r7 gate window (VERDICT r6 task 1 rotation): the
    # three r7 registrations lead, then ALL 26 r3-era rows, then the
    # stalest r4-era cohort (window_ranking_suite rotated to r8 when
    # cohort_retention_orders took slot 1)
    front = set(names[:50])
    for probe in ("cohort_retention_orders",
                  "dedup_lsh_candidates_capped", "incremental_ivf_cells",
                  "array_ops_documents", "map_ops_events",
                  "text_normalize_stopwords", "text_fingerprint",
                  "vec_l2_normalize", "embed_documents", "search_end_to_end",
                  "q1_pricing_summary", "q3_shipping_priority",
                  "q5_region_revenue", "join_outer_customer_orders",
                  "join_full_outer_keys", "join_theta_acctbal_band",
                  "agg_distinct_by_status", "agg_rollup_region_nation",
                  "window_rank_orders_per_customer", "window_running_revenue",
                  "window_share_of_total", "cdc_chunk_documents",
                  "cdc_serialize_rows", "asof_join_purchase_click",
                  "cdc_catalog_watermark_join"):
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
