#!/usr/bin/env python
"""Run N consecutive tools/ab.py windows (subprocesses) and summarize.

Each window is a fresh process — fresh JVM, fresh DuckDB — exactly the
protocol the per-round bar is judged on, so this is the one-command
re-verification of the "N consecutive windows <= BAR" claim.

Usage: python tools/windows.py [N] [--bar 2.0] [--sleep 60]
           [--wait-load L] [--pin-duck SECS] [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

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
    here = os.path.dirname(os.path.abspath(__file__))
    results = []
    for w in range(n):
        if w:
            time.sleep(pause)
        if wait_load is not None:
            deadline = time.monotonic() + 600
            while os.getloadavg()[0] > wait_load and time.monotonic() < deadline:
                time.sleep(15)
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
    met = all(r["ratio"] <= bar for r in ok) and len(ok) == n
    summary = {
        "windows": n,
        "ratios": [r["ratio"] if r else None for r in results],
        "bar": bar,
        "all_windows_at_or_under_bar": met,
    }
    if pin_duck:
        summary["pin_duck"] = pin_duck
        summary["pinned_ratios"] = [
            round(r["spark_total"] / pin_duck, 3) if r else None for r in results
        ]
    print(json.dumps(summary))
    sys.exit(0 if met else 1)


if __name__ == "__main__":
    main()
