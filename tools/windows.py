#!/usr/bin/env python
"""Run N consecutive tools/ab.py windows (subprocesses) and summarize.

Each window is a fresh process — fresh JVM, fresh DuckDB — exactly the
protocol the per-round bar is judged on, so this is the one-command
re-verification of the "N consecutive windows <= BAR" claim.

Usage: python tools/windows.py [N] [--bar 2.0] [--sleep 60]
           [--wait-load L] [--pin-duck SECS] [--discard-first]
           [--out FILE.json] [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

--discard-first: label window 0 ``cold_cache`` and EXCLUDE it from the
bar check. Measured r14 (PERFORMANCE.md "drift curve"): the first
window after heavy churn (driver sweeps, pytest, a reboot) reads a
cold page cache — both engines inflate together and the window
measures IO warm-up, not engine cost. Every window's record is still
written to the artifact; the label is the honesty mechanism.

--out FILE.json: write a machine-readable artifact (the WINDOWS_r{N}
protocol, VERDICT r14 "What's wrong" #2): per-window live + pinned
ratios, spark/duck totals, start AND end 1-minute loads, the bar, the
discard rule actually applied, and the headline query list — so the
bar evidence lives next to BENCH_r{N}.json instead of in prose.

--pin-duck SECS: additionally report each window's Spark total against
a PINNED DuckDB denominator (e.g. the r8-recorded 1.85 s at sf0.1).
The live denominator drifts ±20% with host state (measured r9-r10),
so the live ratio conflates our regressions with DuckDB's host luck;
the pinned ratio isolates the Spark numerator's movement. Both are
printed — the bar check stays on the live ratio.

--wait-load L: before each window, poll until the 1-minute load
average drains to <= L (capped at 10 min, then proceed anyway). The
previous window's own 32-thread tail otherwise leaks into the next
window's timings; each window still REPORTS the load it actually ran
at, so the bar claim stays "at stated load" — this gates when a
window starts, never what it measures.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    n = int(args.pop(0)) if args and args[0].isdigit() else 3
    bar = 2.0
    pause = 60
    if "--bar" in args:
        i = args.index("--bar")
        bar = float(args[i + 1])
        del args[i:i + 2]
    if "--sleep" in args:
        i = args.index("--sleep")
        pause = int(args[i + 1])
        del args[i:i + 2]
    wait_load = None
    if "--wait-load" in args:
        i = args.index("--wait-load")
        wait_load = float(args[i + 1])
        del args[i:i + 2]
    pin_duck = None
    if "--pin-duck" in args:
        i = args.index("--pin-duck")
        pin_duck = float(args[i + 1])
        del args[i:i + 2]
    discard_first = False
    if "--discard-first" in args:
        discard_first = True
        args.remove("--discard-first")
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    here = os.path.dirname(os.path.abspath(__file__))
    results = []
    for w in range(n):
        if w:
            time.sleep(pause)
        if wait_load is not None:
            deadline = time.monotonic() + 600
            while os.getloadavg()[0] > wait_load and time.monotonic() < deadline:
                time.sleep(15)
        try:
            start_load = round(os.getloadavg()[0], 2)
        except OSError:
            start_load = None
        out = subprocess.run(
            [sys.executable, os.path.join(here, "ab.py"), *args],
            capture_output=True, text=True,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"window {w + 1}: FAILED\n{out.stderr[-500:]}", flush=True)
            results.append(None)
            continue
        rec = json.loads(line[-1])
        rec["load_start_1m"] = start_load
        rec["cold_cache"] = bool(discard_first and w == 0)
        results.append(rec)
        pinned = (
            f", pinned-duck ratio {rec['spark_total'] / pin_duck:.3f}x"
            if pin_duck
            else ""
        )
        print(
            f"window {w + 1}: ratio {rec['ratio']:.3f}x "
            f"(spark {rec['spark_total']:.3f} / duck {rec['duck_total']:.3f}, "
            f"load {rec.get('load_avg_1m')}){pinned}",
            flush=True,
        )
    ok = [r for r in results if r is not None]
    counted = [r for r in ok if not r.get("cold_cache")]
    met = all(r["ratio"] <= bar for r in counted) and len(ok) == n
    summary = {
        "windows": n,
        "ratios": [r["ratio"] if r else None for r in results],
        "bar": bar,
        "discard_first": discard_first,
        "all_windows_at_or_under_bar": met,
    }
    if pin_duck:
        summary["pin_duck"] = pin_duck
        summary["pinned_ratios"] = [
            round(r["spark_total"] / pin_duck, 3) if r else None for r in results
        ]
    if out_path:
        artifact = {
            "protocol": (
                "fresh-process interleaved A/B windows (tools/ab.py); "
                "bar judged on live ratios of non-cold windows; window 0 "
                "after churn is labeled cold_cache and excluded when "
                "--discard-first (measured r14: cold page cache inflates "
                "both engines together)"
            ),
            "sf_dir": os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
            ),
            "queries": args or "bench HEADLINE set",
            "generated_unix": int(time.time()),
            "summary": summary,
            "windows_detail": results,
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {out_path}", flush=True)
    print(json.dumps(summary))
    sys.exit(0 if met else 1)


if __name__ == "__main__":
    main()
