

def test_registry_priority_order():
    """The driver's correctness gate samples queries() from the front;
    the never-driver-verified families must occupy the leading slots and
    every priority name must resolve (the assert inside _ordered_registry
    catches typos)."""
    import __spark_entry__ as m

    names = list(m.queries())
    assert names[: len(m._PRIORITY)] == m._PRIORITY
    assert len(names) == len(set(names)) == len(m._REG)
    # spot-pin the r3 gate window: the 35 queries never verified in
    # r1/r2 (TPC-H completions, grouping-sets/set-ops, scalar/array/map
    # suites, text/vec leftovers) lead; r1 padding fills 36-50
    front = set(names[:50])
    for probe in ("q2_min_cost_supplier", "q9_product_type_profit",
                  "q16_parts_supplier_count", "agg_grouping_sets",
                  "set_ops_all_variants", "window_range_frame_spend",
                  "cdc_late_data_rescan", "timeseries_gap_fill",
                  "array_hof_documents", "vec_l2_normalize",
                  "embed_documents", "search_end_to_end"):
        assert probe in front, probe
