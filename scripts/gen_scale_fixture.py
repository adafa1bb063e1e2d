"""Generate an sf1 (10x sf0.1) fixture set for scale-ratio measurement.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md, read-only); every
100 TB claim in SCALE.md is therefore a design argument until at least
one 10x datapoint exists (r5 VERDICT "Next round" #2).  This script
builds `.stage/sf1/` from PUBLIC knowledge of the fixture shapes
(FIXTURES.md):

- `documents` / `embeddings` are generated fresh with the OBSERVED
  sf0.1 statistics (31-word vocab, uniform 10-100 words/doc, 20
  sources, 5 langs; 64-dim L2-normalized float32 vectors, labels 0-9)
  at 10x row counts — fresh generation (not replication) keeps the
  near-dup/LSH bucket distributions comparable to the shipped fixture
  instead of planting 10-cliques of exact duplicates.
- The star-schema + `events` tables are replicated 10x with key-offset
  remaps (PKs and FKs shifted per replica), preserving per-key densities
  (events/user, lines/order) so window/session/stream costs scale in
  ROWS, not in per-key skew.

Deterministic (seed 42).  Output is git-ignored scratch; regenerate at
will:  python scripts/gen_scale_fixture.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
OUT = Path(sys.argv[1]) if len(sys.argv) > 1 else (
    Path(__file__).resolve().parent.parent / ".stage" / "sf1"
)
FACTOR = 10

#: observed sf0.1 vocabulary (31 words, near-uniform frequency)
VOCAB = None  # derived from the shipped fixture below

#: per-replica PK/FK offsets = sf0.1 table sizes (FIXTURES.md)
OFFSETS = {
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "customer": {"c_custkey": 15_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
}


def replicate(name: str) -> None:
    t = pq.read_table(SRC / f"{name}.parquet")
    offs = OFFSETS.get(name, {})
    parts = []
    for i in range(FACTOR):
        cols = {}
        for f in t.schema:
            c = t.column(f.name)
            if f.name in offs and i > 0:
                c = pa.compute.add(c, offs[f.name] * i)
            cols[f.name] = c
        parts.append(pa.table(cols, schema=t.schema if not offs else None))
    out = pa.concat_tables(parts)
    pq.write_table(out, OUT / f"{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def gen_documents(rng: np.random.Generator) -> None:
    src_docs = pq.read_table(SRC / "documents.parquet")
    vocab = sorted(
        {w for txt in src_docs.column("text").to_pylist() for w in txt.split()}
    )
    n = src_docs.num_rows * FACTOR
    langs = np.array(["en", "es", "de", "fr", "zh"])
    sources = np.array([f"src{i}" for i in range(20)])
    lens = rng.integers(10, 101, size=n)
    texts = [
        " ".join(rng.choice(vocab, size=ln)) for ln in lens
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(langs, size=n), pa.string()),
            "source": pa.array(rng.choice(sources, size=n), pa.string()),
            "n_chars": pa.array(
                np.array([len(s) for s in texts]), pa.int64()
            ),
        }
    )
    pq.write_table(t, OUT / "documents.parquet")
    print(f"documents: {src_docs.num_rows} -> {n}")


def gen_embeddings(rng: np.random.Generator) -> None:
    src_n = pq.ParquetFile(SRC / "embeddings.parquet").metadata.num_rows
    n, dim = src_n * 4, 64  # embeddings scale x4 per step (FIXTURES.md)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                list(v), pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, 10, size=n, dtype=np.int32), pa.int32()
            ),
        }
    )
    pq.write_table(t, OUT / "embeddings.parquet")
    print(f"embeddings: {src_n} -> {n}")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    # region/nation are FIXED at every sf (FIXTURES.md): copy verbatim —
    # replicating them would duplicate their PKs and fan out every join
    for name in ["region", "nation"]:
        pq.write_table(pq.read_table(SRC / f"{name}.parquet"),
                       OUT / f"{name}.parquet")
        print(f"{name}: copied (fixed)")
    for name in ["supplier", "customer", "part", "orders", "lineitem",
                 "events"]:
        replicate(name)
    gen_documents(rng)
    gen_embeddings(rng)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
