#!/usr/bin/env python
"""Strip named queries' rows from a sweep jsonl so a --resume pass
re-runs them — the mid-sweep-code-change protocol (see memory /
DEVLOG r11): when a query's engine or oracle changes while a long
sweep is in flight, its already-recorded row reflects the OLD code;
strip it and resume instead of restarting the multi-hour sweep.

Usage: python tools/sweep_strip.py SWEEP_sf10.jsonl query [query ...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import os
    import tempfile

    path, names = sys.argv[1], set(sys.argv[2:])
    rows = [json.loads(line) for line in open(path)]
    keep = [r for r in rows if r["query"] not in names]
    stripped = sorted({r["query"] for r in rows} & names)
    # atomic rewrite (ADVICE r11): these jsonl files hold multi-hour
    # sweep progress — write a sibling temp file and os.replace() it
    # so a crash mid-write can never truncate the record.
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)) or ".", suffix=".jsonl.tmp"
    )
    try:
        with os.fdopen(fd, "w") as fh:
            for r in keep:
                fh.write(json.dumps(r) + "\n")
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    print(f"stripped {stripped} ({len(rows)} -> {len(keep)} rows)")


if __name__ == "__main__":
    main()
