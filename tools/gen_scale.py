"""Generate a larger benchmark scale factor from the sf0.1 testdata.

The driver's round-end measurement may run at a larger scale than the
committed testdata (BENCH_r05.json recorded sf=1.0 with 6M lineitem
rows). /root/testdata is read-only and holds only sf0.001/0.01/0.1, so
for before/after measurement at the escalated scale this script builds
an sf1.0-shaped directory OUTSIDE the testdata tree:

    python tools/gen_scale.py /root/sfgen/sf1.0 10

Block 0 is the original sf0.1 data verbatim. Blocks 1..K-1 are:
  - dimension tables (region, nation): single copy, unchanged;
  - key-shifted copies for the numeric star tables (orders, lineitem,
    customer, supplier, part, events) — FK relationships preserved,
    value distributions identical by construction;
  - freshly sampled documents and embeddings (per-block numpy seed)
    matching the observed generator recipe (31-word vocabulary with
    10-100 words/doc, unit-norm 64-dim gaussian embeddings, labels
    0-9, lang/source frequencies) so text/vector dedup workloads keep
    realistic near-dup rates instead of the 10x-duplicate explosion a
    plain copy would create.

Bench-only data: correctness oracles always run on the committed
sf0.001/0.01/0.1.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.412, 0.140, 0.149, 0.148, 0.151]


def _shift(table: pa.Table, cols: dict) -> pa.Table:
    arrays = []
    for name in table.column_names:
        col = table.column(name)
        if name in cols:
            col = pa.chunked_array(
                [pa.compute.add(c, cols[name]) for c in col.chunks]
            )
        arrays.append(col)
    return pa.Table.from_arrays(arrays, names=table.column_names)


def gen_documents(block: int, n: int, id_shift: int) -> pa.Table:
    rng = np.random.default_rng(42_000 + block)
    nwords = rng.integers(10, 101, size=n)
    texts = [
        " ".join(rng.choice(VOCAB, size=k)) for k in nwords
    ]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(
                np.arange(n, dtype=np.int64) + id_shift, pa.int64()
            ),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(
                [len(t) for t in texts], pa.int64()
            ),
        }
    )


def gen_embeddings(block: int, n: int, id_shift: int) -> pa.Table:
    rng = np.random.default_rng(43_000 + block)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(
                np.arange(n, dtype=np.int64) + id_shift, pa.int64()
            ),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n).astype(np.int32), pa.int32()
            ),
        }
    )


def main() -> None:
    out_dir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)

    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{out_dir}/{t}.parquet")

    shifted = {
        "customer": {"c_custkey": 15_000},
        "supplier": {"s_suppkey": 1_000},
        "part": {"p_partkey": 20_000},
        "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
        "lineitem": {
            "l_orderkey": 150_000,
            "l_partkey": 20_000,
            "l_suppkey": 1_000,
        },
        "events": {"event_id": 100_000, "user_id": 1_500},
    }
    for t, keys in shifted.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        blocks = [base] + [
            _shift(base, {c: b * s for c, s in keys.items()})
            for b in range(1, k)
        ]
        pq.write_table(pa.concat_tables(blocks), f"{out_dir}/{t}.parquet")
        print(t, "rows:", sum(b.num_rows for b in blocks))

    doc0 = pq.read_table(f"{SRC}/documents.parquet")
    docs = [doc0] + [gen_documents(b, 5_000, b * 5_000) for b in range(1, k)]
    pq.write_table(pa.concat_tables(docs), f"{out_dir}/documents.parquet")
    print("documents rows:", sum(d.num_rows for d in docs))

    emb0 = pq.read_table(f"{SRC}/embeddings.parquet")
    embs = [emb0] + [gen_embeddings(b, 2_000, b * 2_000) for b in range(1, k)]
    pq.write_table(pa.concat_tables(embs), f"{out_dir}/embeddings.parquet")
    print("embeddings rows:", sum(e.num_rows for e in embs))


if __name__ == "__main__":
    main()
