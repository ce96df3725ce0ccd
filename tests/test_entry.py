

def test_registry_priority_order():
    """The driver's correctness gate samples queries() from the front;
    the r1-driver-unverified families must occupy the leading slots and
    every priority name must resolve (the assert inside _ordered_registry
    catches typos)."""
    import __spark_entry__ as m

    names = list(m.queries())
    assert names[: len(m._PRIORITY)] == m._PRIORITY
    assert len(names) == len(set(names)) == len(m._REG)
    # spot-pin the gate window: hard TPC-H + vec + ml + mm + stream in first 50
    front = set(names[:50])
    for probe in ("q21_suppliers_kept_waiting", "vec_ann_topk", "ml_hash_split",
                  "mm_frame_sample", "stream_sessionize", "cdc_scd2_history",
                  "join_range_binned", "text_scrub_pii"):
        assert probe in front, probe
