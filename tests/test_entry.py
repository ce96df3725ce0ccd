

def test_registry_priority_order():
    """The driver's correctness gate samples queries() from the front;
    the highest-information entries must occupy the leading slots and
    every priority name must resolve (the assert inside _ordered_registry
    catches typos)."""
    import __spark_entry__ as m

    names = list(m.queries())
    assert names[: len(m._PRIORITY)] == m._PRIORITY
    assert len(names) == len(set(names)) == len(m._REG)
    # spot-pin the r4 gate window: the 13 Spark-4 NTZ casualties (their
    # recovery is the round's headline) + the new outer-join scale
    # variants lead; least-recently-verified r1/r2 entries fill the rest
    front = set(names[:50])
    for probe in ("cdc_incremental_scan", "cdc_watermark_next",
                  "cdc_watermark_upsert", "cdc_snapshot_latest",
                  "asof_join_purchase_click", "cdc_catalog_watermark_join",
                  "cdc_scd2_history", "window_lag_event_gaps",
                  "sort_nulls_ordering", "agg_minby_maxby_events",
                  "timeseries_gap_fill", "funnel_signup_to_purchase",
                  "stream_tumbling_window", "join_salted_outer",
                  "join_range_binned_outer", "layout_zorder_key",
                  "stream_sliding_window", "dedup_lsh_candidates"):
        assert probe in front, probe
