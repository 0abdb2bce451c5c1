#!/usr/bin/env python3
"""Generate a local ~sf1 dataset by replicating the driver's sf0.1 parquet
10x with shifted keys (round-3 verdict item 2: stress the top plans beyond
sf0.1 and prove <= linear scaling).

Design notes — replication must not change the data's *shape*, only its
size, or the scaling measurement is meaningless:

- Fact keys (custkey/orderkey/partkey/suppkey/event_id/user_id/doc_id/
  vec_id) shift by copy * (max+1) so join fan-outs stay identical per
  copy and key-domains stay disjoint.
- Dimensions (region, nation) are NOT scaled — TPC-H semantics; joins
  against them grow linearly on the fact side only.
- documents.text gets every token suffixed with the copy index, which
  makes cross-copy shingle sets fully disjoint: near-dup PAIRS grow 10x
  (linear), not 100x (quadratic), as they would if texts were copied
  verbatim. Within-copy near-dup structure is preserved exactly.
- embeddings roll each vector circularly by the copy index (norm- and
  distribution-preserving, decorrelates copies) so cosine near-dup pairs
  also grow linearly.

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir] [copies]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> int columns shifted by copy * (max(col) + 1)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def key_base(src_tables, table, col):
    return int(pc.max(src_tables[table][col]).as_py()) + 1


def suffix_tokens(texts, i):
    """Append _<i> to every whitespace token (disjoint shingle spaces)."""
    out = []
    for t in texts:
        if t is None:
            out.append(None)
        else:
            out.append(" ".join(f"{tok}_{i}" for tok in t.split()))
    return out


def roll_embeddings(col, i):
    """Circular roll + per-copy deterministic sign flips. Both transforms
    are orthogonal (norm- and within-copy-angle-preserving); the sign
    pattern breaks the roll's mod-dim aliasing — with roll alone, copies
    i and i+dim would carry IDENTICAL vectors under new ids, planting
    fake cross-copy near-dup pairs that grow quadratically with copies.
    The pattern depends on i's low 8 bits, distinct for copies < 256.
    """
    arrs = col.to_pylist()
    out = []
    signs_cache = {}
    for a in arrs:
        if a is None:
            out.append(None)
            continue
        v = np.roll(np.array(a, dtype=np.float32), i)
        n = v.shape[0]
        if n not in signs_cache:
            signs_cache[n] = np.array(
                [-1.0 if (i >> (d & 7)) & 1 else 1.0 for d in range(n)],
                dtype=np.float32)
        out.append((v * signs_cache[n]).tolist())
    return out


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    src = {}
    for t in list(SHIFT) + COPY_AS_IS:
        src[t] = pq.read_table(f"{SRC}/{t}.parquet")

    for t in COPY_AS_IS:
        pq.write_table(src[t], f"{DST}/{t}.parquet")
        print(f"{t}: copied {src[t].num_rows} rows")

    bases = {(t, c): key_base(src, t, c) for t, cols in SHIFT.items() for c in cols}

    for t, cols in SHIFT.items():
        batches = []
        for i in range(COPIES):
            tb = src[t]
            for c in cols:
                shifted = pc.add(tb[c], pa.scalar(i * bases[(t, c)], type=tb.schema.field(c).type))
                tb = tb.set_column(tb.schema.get_field_index(c), tb.schema.field(c), shifted)
            if t == "documents" and i > 0:
                idx = tb.schema.get_field_index("text")
                tb = tb.set_column(idx, tb.schema.field(idx),
                                   pa.array(suffix_tokens(tb["text"].to_pylist(), i),
                                            type=tb.schema.field(idx).type))
            if t == "embeddings" and i > 0:
                idx = tb.schema.get_field_index("embedding")
                tb = tb.set_column(idx, tb.schema.field(idx),
                                   pa.array(roll_embeddings(tb["embedding"], i),
                                            type=tb.schema.field(idx).type))
            batches.append(tb)
        out = pa.concat_tables(batches)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(f"{t}: {src[t].num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
