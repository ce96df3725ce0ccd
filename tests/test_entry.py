

def test_registry_priority_order():
    """The driver's correctness gate samples queries() from the front;
    the highest-information entries must occupy the leading slots and
    every priority name must resolve (the assert inside _ordered_registry
    catches typos)."""
    import __spark_entry__ as m

    names = list(m.queries())
    assert names[: len(m._PRIORITY)] == m._PRIORITY
    assert len(names) == len(set(names)) == len(m._REG)
    # spot-pin the r6 gate window (VERDICT r5 task 1 rotation): the
    # queries without a current-runtime driver row lead — the two r5
    # post-window registrations, the never-sampled rows-only HLL
    # rollup, the new r6 maximal funnel, then the r2-era and stalest
    # r3-era rows
    front = set(names[:50])
    for probe in ("text_mad_outliers", "window_time_range_moving_sum",
                  "incremental_distinct_rollup", "funnel_three_step_maximal",
                  "q15_top_supplier", "vec_ann_topk", "vec_banded_neardup",
                  "ml_stratified_sample", "profile_documents",
                  "mm_binary_features", "stream_sessionize",
                  "cdc_time_travel", "sql_frontend_having",
                  "q2_min_cost_supplier", "agg_grouping_sets",
                  "set_ops_all_variants", "cdc_late_data_rescan",
                  "scalar_regexp_advanced", "scalar_try_cast_safe",
                  "text_bm25_rank", "incremental_topk_rollup",
                  "search_rrf_fusion", "incremental_theta_overlap"):
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
