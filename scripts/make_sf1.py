#!/usr/bin/env python3
"""One-off sf1.0 fixture builder for the scale-evidence bench run
(BENCH_NOTES.md): 10x sf0.1, documents + lineitem only (the tables the 10
heaviest queries read). Replica texts are deterministically word-shuffled
(seeded per copy+doc) so copies keep the corpus's token histogram — token
counts, quality blends and unigram stats stay realistic — WITHOUT forming
artificial near-dup clusters: verbatim replication would hand every doc 9
exact twins and turn the dedup queries' pair joins quadratic in the
replica count, measuring the fixture instead of the engine.

Usage: make_sf1.py [outDir]    (default target/sf1.0)
"""
import random
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "target/sf1.0")
COPIES = 10

OUT.mkdir(parents=True, exist_ok=True)

# ---- documents: shift ids, shuffle replica word order deterministically ----
docs = pq.read_table(SRC / "documents.parquet")
cols = {c: docs.column(c).to_pylist() for c in docs.column_names}
n = docs.num_rows
out = {c: [] for c in docs.column_names}
for i in range(COPIES):
    for r in range(n):
        out["doc_id"].append(cols["doc_id"][r] + i * 10_000_000)
        out["lang"].append(cols["lang"][r])
        out["source"].append(cols["source"][r])
        t = cols["text"][r]
        if i > 0 and t:
            words = t.split(" ")
            rng = random.Random(i * 1_000_000_007 + cols["doc_id"][r])
            rng.shuffle(words)
            # salt ~1/13 of tokens: word shuffling alone keeps the token
            # MULTISET identical, which leaves bag-of-words fingerprints
            # (SimHash) byte-identical across replicas — 45 artificial
            # hamming-0 pairs per source doc would then measure the
            # fixture, not the engine
            for p in range(i % 13, len(words), 13):
                words[p] = f"w{i}{words[p]}"
            t = " ".join(words)
        out["text"].append(t)
        out["n_chars"].append(len(t))
pq.write_table(
    pa.table(out, schema=docs.schema), OUT / "documents.parquet")
print(f"documents: {n} -> {n * COPIES} rows")

# ---- lineitem: shift order keys ----
li = pq.read_table(SRC / "lineitem.parquet")
parts = []
for i in range(COPIES):
    t = li.set_column(
        li.column_names.index("l_orderkey"), "l_orderkey",
        pa.compute.add(li.column("l_orderkey"), i * 100_000_000))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), OUT / "lineitem.parquet")
print(f"lineitem: {li.num_rows} -> {li.num_rows * COPIES} rows")

# ---- events: shift event + user ids (10x users, same per-user density ----
# and time range — the "more users" scale-up; colliding user_ids would
# instead 10x per-user traffic and measure a different query)
ev = pq.read_table(SRC / "events.parquet")
parts = []
for i in range(COPIES):
    t = ev.set_column(
        ev.column_names.index("event_id"), "event_id",
        pa.compute.add(ev.column("event_id"), i * 1_000_000_000))
    t = t.set_column(
        t.column_names.index("user_id"), "user_id",
        pa.compute.add(t.column("user_id"), i * 10_000_000))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), OUT / "events.parquet")
print(f"events: {ev.num_rows} -> {ev.num_rows * COPIES} rows")

# ---- orders: shift order + customer keys (for the merge-gate fixtures) ----
od = pq.read_table(SRC / "orders.parquet")
parts = []
for i in range(COPIES):
    t = od.set_column(
        od.column_names.index("o_orderkey"), "o_orderkey",
        pa.compute.add(od.column("o_orderkey"), i * 100_000_000))
    t = t.set_column(
        t.column_names.index("o_custkey"), "o_custkey",
        pa.compute.add(t.column("o_custkey"), i * 10_000_000))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), OUT / "orders.parquet")
print(f"orders: {od.num_rows} -> {od.num_rows * COPIES} rows")

# ---- embeddings: shift ids, jitter replica vectors deterministically ----
# verbatim copies would hand every vector 9 cosine-1.0 twins (the same
# fixture artifact the text salt exists to avoid); +-5% per-component
# jitter keeps the cluster structure without exact twins
emb = pq.read_table(SRC / "embeddings.parquet")
ecols = {c: emb.column(c).to_pylist() for c in emb.column_names}
eout = {c: [] for c in emb.column_names}
for i in range(COPIES):
    for r in range(emb.num_rows):
        eout["vec_id"].append(ecols["vec_id"][r] + i * 1_000_000)
        eout["label"].append(ecols["label"][r])
        v = ecols["embedding"][r]
        if i > 0 and v is not None:
            rng = random.Random(i * 2_000_000_011 + ecols["vec_id"][r])
            v = [x * (1.0 + 0.05 * (2 * rng.random() - 1)) for x in v]
        eout["embedding"].append(v)
pq.write_table(pa.table(eout, schema=emb.schema), OUT / "embeddings.parquet")
print(f"embeddings: {emb.num_rows} -> {emb.num_rows * COPIES} rows")

# ---- dims: copied UNCHANGED (customer/supplier/part/nation/region) ----
# star-join fixture realism: facts grow 10x, dimensions grow slowly or not
# at all; replicated orders keep their o_custkey, so each customer simply
# serves 10x the orders — the exact shape the broadcast-dim plan is for
import shutil
for t in ["customer", "supplier", "part", "nation", "region"]:
    src = SRC / f"{t}.parquet"
    if src.exists():
        shutil.copyfile(src, OUT / f"{t}.parquet")
        print(f"{t}: copied unchanged ({pq.read_table(src).num_rows} rows)")
