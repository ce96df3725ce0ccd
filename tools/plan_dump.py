#!/usr/bin/env python
"""Dump `.explain("formatted")` for declared queries to plans/<tag>/.

Optimization-round evidence: the judge checks plan claims (Exchange
counts, join strategies, PushedFilters, Python-eval nodes) against
committed plan files, so every optimization captures a before/after
pair from the SAME session policy the bench uses (sized_session).

Usage:
    python tools/plan_dump.py <tag> [query ...]

Writes plans/<tag>/<query>.txt for each named query (default: the
bench HEADLINE set). Plans are captured at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) — plan SHAPE, not timing, so host load
does not matter.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "scratch"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = entrymod.queries()
    names = sys.argv[2:] or bench.HEADLINE
    if names == ["--all"]:
        names = list(queries)
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = bench.sized_session(sf_dir, app_name=f"plan_dump_{tag}")
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        try:
            # per-query landed confs ride the queries themselves since
            # r16 (session.conf_pinned_session) — nothing to wrap here
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(f"-- query: {name}\n-- sf_dir: {sf_dir}\n\n{text}")
        print(f"wrote {tag}/{name}.txt")


if __name__ == "__main__":
    main()
