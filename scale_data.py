"""Scale-point data generator: synthesize sf{N} tables from the
driver's sf0.1 parquet by deterministic replication — the recipe
behind SCALE.md's MEASURED sf1/sf0.1 ratios (VERDICT r11 item #1).

The driver's generator isn't shipped, so true-sf1 regeneration isn't
possible; what a scaling MEASUREMENT needs is data whose statistical
shape matches sf0.1 while every scalable cardinality grows linearly.
Replication with key remapping gives exactly that, by construction:

- Each replica i (0..R-1) offsets every scalable key by i x stride
  (stride = next power of 10 above the key's max, so replicas can
  never collide and keys stay human-readable). Foreign keys are
  offset by the SAME stride as their parent, so join fan-outs,
  group sizes, and per-key skew are IDENTICAL to sf0.1 in every
  replica — per-key distributions are preserved exactly while key
  cardinality scales by R.
- nation/region stay fixed (TPC-H semantics: dimension tables don't
  scale), so dimension-broadcast joins see realistic growth: fact
  side xR, broadcast side constant.
- documents: doc_id offsets; for i>0 every token is INJECTIVELY
  RENAMED into a replica-private token space (tok -> tok + 'r{i}').
  A verbatim copy would make every document a 10-way near-duplicate
  (duplication rate 10x — a different workload, not a bigger one);
  the first cut of this generator instead PERMUTED tokens, which
  destroyed natural shingle statistics and produced random 3-shingle
  collisions across replicas — prefix-filter candidates grew
  quadratically (measured 125x candidates / 62x runtime for
  ppjoin_pairs at 10x; SCALE.md records the adjudication). Injective
  renaming is the principled model: within a replica every token-set
  and shingle-set relationship (Jaccard, containment, prefix order)
  is EXACTLY sf0.1's, across replicas token spaces are disjoint — so
  the corpus behaves as R independent shards of identical
  statistics, which is how a 10x corpus actually grows. Vocabulary,
  duplicate pairs, and candidate volumes all scale linearly by
  construction. n_chars is recomputed from the rebuilt text.
- embeddings: vec_id offsets; for i>0 a deterministic per-replica
  SIGN-FLIP pattern multiplies ~half the components by -1. A sign
  flip is an orthogonal transform, so every within-replica distance,
  norm, and cosine is EXACTLY sf0.1's, while cross-replica cosine
  collapses toward 0 for balanced patterns. (The first cut used a
  cyclic shift — WRONG for these embeddings: neighboring components
  are correlated, so shift-by-i is nearly the identity and every
  vector gained R-1 near-perfect cross-replica neighbors; measured
  as dup_clusters collapsing to ONE 20k-node component at sf1. The
  flip fix restores R independent shards: components x10, all
  cluster structure per replica identical to sf0.1.)
- events: event_id/user_id offset; timestamps unchanged (10x users
  over the same wall-clock span = 10x traffic density, which is how
  event volume actually grows; windowed/session state scales with
  users, exactly the axis worth measuring).

Determinism: pure arithmetic on keys + a fixed per-replica token
tag; regenerating produces byte-identical frames.

Usage:
    python scale_data.py --out /root/repo/.scale/sf1 --replicas 10
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

TABLES_COPY = ["region", "nation"]
# table -> {column: stride-group}; columns sharing a group share the
# stride so FK relationships survive the offset
KEY_GROUPS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


def _strides() -> dict[str, int]:
    """One stride per key group: the next power of 10 strictly above
    the group's max observed value across all tables."""
    mx: dict[str, int] = {}
    for table, cols in KEY_GROUPS.items():
        t = pq.read_table(f"{SRC}/{table}.parquet", columns=list(cols))
        for col, grp in cols.items():
            m = pc.max(t[col]).as_py() or 0
            mx[grp] = max(mx.get(grp, 0), int(m))
    out = {}
    for grp, m in mx.items():
        s = 10
        while s <= m:
            s *= 10
        out[grp] = s
    return out


def _rename_tokens(text: str, i: int) -> str:
    tag = f"r{i}"
    return " ".join(t + tag for t in text.split())


def _replicate(table: str, i: int, strides: dict[str, int]) -> pa.Table:
    t = pq.read_table(f"{SRC}/{table}.parquet")
    cols = {}
    for name in t.column_names:
        col = t[name]
        grp = KEY_GROUPS.get(table, {}).get(name)
        if grp is not None and i > 0:
            col = pc.add(col, i * strides[grp])
        cols[name] = col
    if table == "customer" and i > 0:
        # replica-tag names with a DOUBLED letter: any two tags (and
        # tag vs no-tag) differ by >= 2 edits, so replication creates
        # no artificial cross-replica distance-1 name pairs, while
        # within-replica pairwise edit distances are exactly sf0.1's
        # — typo_pairs' distinct-name workload scales linearly
        tag = chr(ord("a") + (i - 1) % 26) * 2
        names = cols["c_name"].to_pylist()
        cols["c_name"] = pa.array(
            [n + tag if n is not None else None for n in names],
            type=pa.string(),
        )
    if table == "documents" and i > 0:
        texts = cols["text"].to_pylist()
        new_texts = [
            _rename_tokens(tx, i) if tx is not None else None
            for tx in texts
        ]
        cols["text"] = pa.array(new_texts, type=pa.string())
        cols["n_chars"] = pa.array(
            [len(x) if x is not None else None for x in new_texts],
            type=pa.int64(),
        )
    if table == "embeddings" and i > 0:
        vecs = cols["embedding"].to_pylist()
        # deterministic balanced sign pattern per replica (md5 bit
        # per (replica, component): distinct ~half-flips for every
        # replica AND every replica PAIR, so no two replicas share a
        # pattern) — an isometry, so within-replica geometry is
        # exactly sf0.1's
        import hashlib

        dim = next(len(v) for v in vecs if v)
        sign = [
            -1.0
            if hashlib.md5(f"emb:{i}:{k}".encode()).digest()[0] & 1
            else 1.0
            for k in range(dim)
        ]
        flipped = []
        for v in vecs:
            if not v:
                flipped.append(v)
                continue
            flipped.append([s * x for s, x in zip(sign, v)])
        cols["embedding"] = pa.array(
            flipped, type=t.schema.field("embedding").type
        )
    arrays, fields = [], []
    for f in t.schema:
        c = cols[f.name]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        # keep the source dtype exactly (pc.add may widen)
        if c.type != f.type:
            c = c.cast(f.type)
        arrays.append(c)
        fields.append(f)
    return pa.table(dict(zip([f.name for f in fields], arrays)), schema=pa.schema(fields))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    strides = _strides()
    print("strides:", strides)
    for table in TABLES_COPY:
        t = pq.read_table(f"{SRC}/{table}.parquet")
        pq.write_table(t, f"{args.out}/{table}.parquet")
        print(table, t.num_rows, "(copied)")
    for table in KEY_GROUPS:
        parts = [
            _replicate(table, i, strides) for i in range(args.replicas)
        ]
        merged = pa.concat_tables(parts)
        pq.write_table(merged, f"{args.out}/{table}.parquet")
        print(table, merged.num_rows)


if __name__ == "__main__":
    main()
