#!/usr/bin/env python
"""Deterministic scale-up of the driver fixtures (VERDICT r5 task 3).

Produces an sf-K directory (default 10x sf0.1 ~= sf1) with the same
nine tables and schemas, for CROSS-SCALE PERFORMANCE measurement —
checking that the floor-dominated sf0.1 ratios extrapolate the way
PERFORMANCE.md predicts, and catching any operator whose
Spark/DuckDB ratio GROWS with data. Never writes to /root/testdata.

Construction (seed-fixed, no wall-clock): replica 0 is the source
data verbatim; replicas 1..K-1 shift every key domain by
``i * (max_key + 1)`` so primary/foreign key relationships, join
fan-outs, and group cardinalities per replica match the source
exactly (dims region/nation stay fixed, like TPC-H's constant
tables). Content columns are mutated where sameness would distort an
operator's combinatorics rather than its volume:

- documents.text: every 7th token gets a per-replica suffix, keeping
  token/char counts within noise but making fingerprints, shingle
  sets and LSH bands distinct — otherwise every doc gains 9 exact
  copies and candidate-pair counts grow quadratically instead of
  linearly, which is a DIFFERENT workload, not a bigger one.
  n_chars is recomputed to stay consistent.
- embeddings.embedding: i.i.d. N(0, 0.02) perturbation per replica —
  preserves the cluster geometry ANN queries probe while keeping
  near-dup cosine pairs from exploding.

Usage: python tools/gen_sf.py [K] [SRC_DIR] [OUT_DIR]
Defaults: 10 /root/testdata/sf0.1 fixtures/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# key columns mapped to their key DOMAIN: every column of a domain
# shifts by the same i * (domain_max + 1) per replica, where
# domain_max is the max over ALL the domain's columns — a per-column
# max would desynchronize a FK from its PK whenever some PK values
# are unreferenced (review fix: on standard TPC-H a third of
# customers place no orders, so max(o_custkey) < max(c_custkey) and
# per-column offsets would point replica orders at missing
# customers). Value columns pass through.
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "events": {"event_id": "eventkey", "user_id": "userkey"},
    "documents": {"doc_id": "dockey"},
    "embeddings": {"vec_id": "veckey"},
}
COPY_ONLY = ["region", "nation"]


def _domain_offsets(src: str) -> dict[str, int]:
    """offset unit per key domain: max over every column of the domain
    across all tables, + 1."""
    maxima: dict[str, int] = {}
    for name, cols in KEYED.items():
        table = pq.read_table(
            os.path.join(src, f"{name}.parquet"), columns=list(cols)
        )
        for col, domain in cols.items():
            m = int(pa.compute.max(table[col]).as_py())
            maxima[domain] = max(maxima.get(domain, 0), m)
    return {d: m + 1 for d, m in maxima.items()}


def _mutate_text(texts: np.ndarray, replica: int) -> tuple[list, list]:
    out, n_chars = [], []
    for t in texts:
        if t is None:
            out.append(None)
            n_chars.append(None)
            continue
        toks = t.split(" ")
        for p in range(replica % 7, len(toks), 7):
            toks[p] = f"{toks[p]}r{replica}"
        s = " ".join(toks)
        out.append(s)
        n_chars.append(len(s))
    return out, n_chars


def scale_table(src: str, dst: str, name: str, k: int, units: dict[str, int]) -> int:
    table = pq.read_table(os.path.join(src, f"{name}.parquet"))
    writer = pq.ParquetWriter(os.path.join(dst, f"{name}.parquet"), table.schema)
    rng = np.random.RandomState(42)
    offsets = {c: units[d] for c, d in KEYED.get(name, {}).items()}
    total = 0
    for i in range(k):
        cols = {}
        for field in table.schema:
            col = table[field.name]
            if field.name in offsets and i > 0:
                col = pa.compute.add(col, offsets[field.name] * i)
                col = col.cast(field.type)
            cols[field.name] = col
        if name == "documents" and i > 0:
            txt, nch = _mutate_text(table["text"].to_pandas().to_numpy(), i)
            cols["text"] = pa.array(txt, type=pa.string())
            cols["n_chars"] = pa.array(nch, type=pa.int64())
        if name == "embeddings" and i > 0:
            emb = np.vstack(table["embedding"].to_pandas().to_numpy())
            emb = emb + rng.normal(0.0, 0.02, emb.shape).astype(np.float32)
            cols["embedding"] = pa.array(list(emb), type=table.schema.field("embedding").type)
        batch = pa.table(cols, schema=table.schema)
        writer.write_table(batch)
        total += batch.num_rows
    writer.close()
    return total


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "sf1"
    )
    os.makedirs(dst, exist_ok=True)
    for name in COPY_ONLY:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} (copied)")
    units = _domain_offsets(src)
    for name in KEYED:
        n = scale_table(src, dst, name, k, units)
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
