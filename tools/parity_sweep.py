#!/usr/bin/env python
"""Full-registry oracle parity sweep at an arbitrary scale factor.

VERDICT r9 task 4: the driver's correctness gate runs at sf0.01, but
the >=1 GiB fixtures (fixtures/sf10) exercise a different execution
regime — AQE runtime re-planning, shuffled hash joins, 100-row-group
scans — exactly where a silent wrong answer could hide behind a plan
change. This sweep runs EVERY oracle-backed `queries()` entry against
the DuckDB oracle at the given fixture dir and records a tally.

Usage:
    python tools/parity_sweep.py [sf_dir] [--resume]

Writes one JSON line per query to SWEEP_<name>.jsonl as it goes
(resume skips recorded queries), then a summary to SWEEP_<name>.json.
Known benign deviation class: floating SUMs over millions of rows can
differ in the last ~2 ulps between engines because partial-aggregate
summation order differs (measured rel err ~1e-15); those appear as
hash mismatches whose numeric columns agree to >=12 significant
digits. The summary classifies them separately from real mismatches.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


#: Queries whose ORACLE (not the engine) cannot scale to the given
#: fixture. Empty since r11: the dedup cluster oracles' quadratic
#: transitive-closure CTE (>27 min at sf10) was replaced by unrolled
#: min-label + pointer-jump rounds (linear per round — see
#: __spark_entry__._duck_cluster_labels_cte), measured 75 s on the
#: 1M-node sf10 doubled corpus with the engine-matching 341180-row
#: survivor set. The mechanism stays for any future genuinely
#: unscalable oracle: {"<sf_dir suffix>": {"<query>": "<reason>"}}.
ORACLE_UNSCALABLE: dict[str, dict[str, str]] = {}


#: Above this result size the row-by-row oracle_harness.compare (pure
#: Python over collect()ed Rows — the driver-identical gate) becomes
#: the bottleneck AND a driver-memory risk (60M-row full-projection
#: results at sf10). Larger results go through the vectorized Arrow
#: compare below: same multiset-equality question, answered columnar.
FAST_COMPARE_MIN_ROWS = 200_000

#: Above this result size NO driver-side materialization is sane (the
#: sf10 interval-overlap pair list is 1.29 BILLION rows — overlap
#: joins are semantically quadratic in dense regions). Parity is then
#: checked by aggregates computed INSIDE each engine: row count, exact
#: integer-column sums (BIGINT-exact both sides), double sums at rel
#: 1e-6 (summation-order drift over 10^9 rows), string length sums,
#: timestamp epoch averages. Any logic bug moves these by orders of
#: magnitude; nothing is shipped to the driver but the aggregates.
AGG_COMPARE_MIN_ROWS = 20_000_000


def _agg_compare(spark_df, con, sql: str, n_expected: int) -> dict:
    import math

    from pyspark.sql import functions as F

    d_schema = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
    d_cols = list(d_schema.columns)
    d_types = [str(t).upper() for t in d_schema.types]
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    out = {
        "agg_compare": True,
        "rows_spark": None,
        "rows_duck": n_expected,
        "cols_match": sorted(d_cols) == sorted(s_types),
    }
    duck_aggs, spark_aggs, kinds = ["count(*)"], [F.count(F.lit(1))], ["exact"]
    for c, dt in zip(d_cols, d_types):
        st = s_types.get(c, "")
        if any(k in dt for k in ("INT", "HUGEINT")) and "POINT" not in dt:
            duck_aggs.append(f'CAST(sum("{c}") AS VARCHAR)')
            spark_aggs.append(F.sum(F.col(c)).cast("string"))
            kinds.append("exact")
        elif any(k in dt for k in ("DOUBLE", "FLOAT", "DECIMAL")):
            duck_aggs.append(f'sum("{c}"::DOUBLE)')
            spark_aggs.append(F.sum(F.col(c).cast("double")))
            kinds.append("approx")
        elif "TIMESTAMP" in dt or "DATE" in dt:
            duck_aggs.append(f'avg(epoch_us("{c}"::TIMESTAMP))')
            spark_aggs.append(F.avg(F.unix_micros(F.col(c).cast("timestamp"))))
            kinds.append("approx")
        elif "BOOL" in dt:
            duck_aggs.append(f'CAST(sum(CASE WHEN "{c}" THEN 1 ELSE 0 END) AS VARCHAR)')
            spark_aggs.append(F.sum(F.when(F.col(c), 1).otherwise(0)).cast("string"))
            kinds.append("exact")
        else:
            duck_aggs.append(f'CAST(sum(length("{c}")) AS VARCHAR)')
            spark_aggs.append(F.sum(F.length(F.col(c))).cast("string"))
            kinds.append("exact")
    d_row = con.sql(
        f"SELECT {', '.join(duck_aggs)} FROM ({sql}) q"
    ).fetchone()
    s_row = spark_df.agg(*spark_aggs).collect()[0]
    out["rows_spark"] = int(s_row[0])
    out["rows_match"] = out["rows_spark"] == n_expected
    ok = out["rows_match"] and out["cols_match"]
    diffs = []
    for i, kind in enumerate(kinds[1:], start=1):
        a, b = s_row[i], d_row[i]
        if kind == "exact":
            same = str(a) == str(b)
        else:
            fa = float(a) if a is not None else math.nan
            fb = float(b) if b is not None else math.nan
            if math.isnan(fa) and math.isnan(fb):
                same = True
            else:
                same = abs(fa - fb) <= 1e-6 * max(abs(fa), abs(fb), 1e-300)
        if not same:
            diffs.append({"agg_index": i, "spark": str(a)[:40], "duck": str(b)[:40]})
            ok = False
    out["values_match"] = ok
    if diffs:
        out["agg_diffs"] = diffs[:5]
    return out


def _arrow_norm(tbl, float_dp=None):
    """pyarrow Table -> pandas DataFrame with columns sorted by name
    and values normalized for cross-engine comparison (decimals ->
    float64, timestamps -> int64 us, binary -> hex)."""
    import numpy as np
    import pyarrow as pa

    df = tbl.to_pandas(types_mapper=None)
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if s.dtype == object and len(s) and isinstance(
            next((v for v in s if v is not None), None), (bytes, bytearray)
        ):
            df[c] = s.map(lambda b: b.hex() if b is not None else None)
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("int64")
        elif s.dtype.kind in "iu":
            # dtype-normalize: engines disagree on integer WIDTH
            # (int32 vs int64) for the same values, and
            # Series.equals is dtype-sensitive
            df[c] = s.astype("int64")
        elif s.dtype.kind == "b":
            df[c] = s.astype("int64")
        elif s.dtype.kind == "f":
            df[c] = s.astype("float64")
        elif s.dtype == object:
            # decimals and lists: stringify deterministically
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df


def _fast_compare(spark_df, con, sql: str) -> dict:
    """Vectorized multiset compare for large results: both engines
    materialize to Arrow, rows are sorted on every column, and float
    columns compare with rel tol 1e-12 (the cross-engine
    summation-order class) while everything else compares exactly.
    Returns the same dict shape oracle_harness.compare produces, plus
    ``float_only`` when the only differences were in-tolerance
    floats."""
    import numpy as np
    import pandas as pd

    s = _arrow_norm(spark_df.toArrow())
    d = _arrow_norm(con.sql(sql).arrow())
    out = {
        "rows_spark": len(s),
        "rows_duck": len(d),
        "cols_match": list(s.columns) == list(d.columns),
        "rows_match": len(s) == len(d),
        "fast_path": True,
    }
    if not out["cols_match"] or not out["rows_match"]:
        out["values_match"] = False
        return out
    # width-align: a column that is int64 on one side and float64 on
    # the other (nullable ints surface as float64 in pandas) must
    # compare as float on both
    for c in s.columns:
        kinds = {s[c].dtype.kind, d[c].dtype.kind}
        if "f" in kinds and kinds != {"f"}:
            s[c] = s[c].astype("float64")
            d[c] = d[c].astype("float64")
    non_float = [c for c in s.columns if s[c].dtype.kind not in "fc"]
    s = s.sort_values(list(s.columns), kind="mergesort", na_position="last").reset_index(drop=True)
    d = d.sort_values(list(d.columns), kind="mergesort", na_position="last").reset_index(drop=True)
    exact_ok = all(s[c].equals(d[c]) for c in non_float)
    float_ok = True
    float_exact = True
    for c in s.columns:
        if s[c].dtype.kind in "fc":
            a, b = s[c].to_numpy(), d[c].to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            eq = (a == b) | both_nan
            float_exact = float_exact and bool(eq.all())
            close = np.isclose(a, b, rtol=1e-12, atol=0.0, equal_nan=True)
            float_ok = float_ok and bool(close.all())
    out["values_match"] = exact_ok and float_exact
    if not out["values_match"]:
        out["float_only"] = exact_ok and float_ok
    return out


def _float_only_deviation(res: dict) -> bool:
    """True when the hash mismatch is confined to numeric cells that
    agree to >=9 significant digits — the cross-engine summation-order
    class (benign, documented in PERFORMANCE.md), not a logic bug.
    9 digits, not 12, because this inspects the HARNESS-NORMALIZED
    strings: oracle_harness renders floats with %.10g (and whole
    floats as ints), so a true 1e-15 deviation that crosses the
    int/float render boundary (q1's 2.8e11-magnitude sums) surfaces
    here as a ~1e-10 string-level difference. The fast path
    (_fast_compare) classifies from raw values at rel 1e-12."""
    only_s = res.get("only_spark") or []
    only_d = res.get("only_duck") or []
    if not only_s or len(only_s) != len(only_d):
        return False
    for s_line, d_line in zip(sorted(only_s), sorted(only_d)):
        s_cells = s_line.split("|")
        d_cells = d_line.split("|")
        if len(s_cells) != len(d_cells):
            return False
        for a, b in zip(s_cells, d_cells):
            if a == b:
                continue
            try:
                fa, fb = float(a), float(b)
            except ValueError:
                return False
            denom = max(abs(fa), abs(fb), 1e-300)
            if abs(fa - fb) / denom > 1e-9:
                return False
    return True


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    resume = "--resume" in sys.argv
    shard_i, shard_n = 0, 1
    for a in sys.argv[1:]:
        if a.startswith("--shard="):
            shard_i, shard_n = (int(x) for x in a.split("=")[1].split("/"))
    sf_dir = args[0] if args else os.path.join(REPO, "fixtures", "sf10")
    tag = os.path.basename(os.path.normpath(sf_dir))
    jsonl = os.path.join(REPO, f"SWEEP_{tag}.jsonl")
    summary_path = os.path.join(REPO, f"SWEEP_{tag}.json")

    import __spark_entry__ as entrymod
    from bench import sized_session
    from oracle_harness import compare, duck_con

    done: dict[str, dict] = {}
    if resume and os.path.exists(jsonl):
        with open(jsonl) as fh:
            for line in fh:
                rec = json.loads(line)
                done[rec["query"]] = rec
    elif os.path.exists(jsonl) and not resume:
        os.remove(jsonl)

    spark = sized_session(sf_dir, app_name=f"parity-sweep-{tag}")

    def fresh_con():
        # fresh connection PER QUERY: a DuckDB memory error poisons
        # the connection and cascades instant failures onto every
        # later oracle. An in-memory DuckDB also cannot spill without
        # a temp dir, and its default memory target (80% of RAM)
        # overcommits against the Spark JVM — big sf10 oracle
        # intermediates then die with malloc "bad allocation" instead
        # of spilling. Bound it explicitly and give it disk.
        c = duck_con(sf_dir)
        # PER-PROCESS spill dir: concurrent shards sharing one
        # temp_directory clobber each other's spill files — DuckDB
        # aborts the whole process with an IOException on cleanup
        # ("Could not remove file ... duckdb_temp_storage"), observed
        # killing a shard mid-sweep in r11.
        c.sql(f"SET temp_directory='/tmp/duck_sweep_spill_{os.getpid()}'")
        c.sql("SET max_temp_directory_size='80GB'")
        # 24GB coexists with sharded Spark JVMs; the sf10 PQ oracles
        # genuinely need ~60GB+ (247KB codebook-literal SQL over 200k
        # vectors) — run those solo with SWEEP_DUCK_MEM=80GB
        c.sql(f"SET memory_limit='{os.environ.get('SWEEP_DUCK_MEM', '24GB')}'")
        return c

    con = fresh_con()
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    skip = {}
    for key, entries in ORACLE_UNSCALABLE.items():
        if sf_dir.rstrip("/").endswith(key):
            skip = entries
    t0 = time.time()
    n_run = 0
    with open(jsonl, "a") as out:
        for qi, (name, fn) in enumerate(qs.items()):
            if name not in sqls or name in done or qi % shard_n != shard_i:
                continue
            rec: dict = {"query": name}
            t = time.time()
            try:
                con.close()  # each con owns a thread pool — leak = EAGAIN
            except Exception:
                pass
            con = fresh_con()
            if name in skip:
                # engine-side rows-only evidence for the record
                try:
                    rec["spark_rows_only"] = fn(spark, sf_dir).count()
                except Exception as exc:
                    rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
                rec["oracle_unscalable"] = skip[name]
                rec["sec"] = round(time.time() - t, 2)
                out.write(json.dumps(rec) + "\n")
                out.flush()
                done[name] = rec
                continue
            try:
                n_expected = con.sql(
                    f"SELECT count(*) FROM ({sqls[name]}) _q"
                ).fetchone()[0]
                if n_expected >= AGG_COMPARE_MIN_ROWS:
                    res = _agg_compare(fn(spark, sf_dir), con, sqls[name], n_expected)
                    rec["agg_compare"] = True
                elif n_expected >= FAST_COMPARE_MIN_ROWS:
                    res = _fast_compare(fn(spark, sf_dir), con, sqls[name])
                    rec["fast_path"] = True
                else:
                    res = compare(fn(spark, sf_dir), con, sqls[name])
                rec["rows_spark"] = res["rows_spark"]
                rec["rows_duck"] = res["rows_duck"]
                rec["values_match"] = res["values_match"]
                rec["cols_match"] = res["cols_match"]
                if not res["values_match"]:
                    # _fast_compare classifies float-only drift itself from
                    # raw values (it never populates only_spark/only_duck,
                    # so _float_only_deviation would wrongly report a benign
                    # summation-order drift as real_mismatch — ADVICE r10)
                    rec["float_only"] = res.get(
                        "float_only", _float_only_deviation(res)
                    )
                    rec["only_spark"] = (res.get("only_spark") or [])[:3]
                    rec["only_duck"] = (res.get("only_duck") or [])[:3]
            except Exception as exc:  # record, keep sweeping
                rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            rec["sec"] = round(time.time() - t, 2)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            done[name] = rec
            n_run += 1

    recs = list(done.values())
    unscalable = [r for r in recs if "oracle_unscalable" in r]
    recs = [r for r in recs if "oracle_unscalable" not in r]
    fails = [r for r in recs if not r.get("values_match") and "err" not in r]
    errs = [r for r in recs if "err" in r]
    float_only = [r for r in fails if r.get("float_only")]
    real = [r for r in fails if not r.get("float_only")]
    summary = {
        "sf_dir": sf_dir,
        "total_oracle_queries": len(recs),
        "pass": len(recs) - len(fails) - len(errs),
        "float_only_deviation": sorted(r["query"] for r in float_only),
        "real_mismatch": sorted(r["query"] for r in real),
        "oracle_unscalable_rows_only": {
            r["query"]: {
                "reason": r["oracle_unscalable"],
                "spark_rows": r.get("spark_rows_only"),
                "spark_sec": r.get("sec"),
            }
            for r in unscalable
        },
        "errors": {r["query"]: r["err"] for r in errs},
        "wall_sec_this_run": round(time.time() - t0, 1),
        "slowest": dict(
            sorted(((r["query"], r["sec"]) for r in recs if "sec" in r),
                   key=lambda kv: -kv[1])[:15]
        ),
    }
    with open(summary_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1))
    sys.exit(0 if not real and not errs else 1)


if __name__ == "__main__":
    main()
