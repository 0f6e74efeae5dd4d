"""Perf-only scale-up of the driver testdata: replicate sf0.1 into a
10x (~sf1) dataset for scale-regime benchmarking (VERDICT r8 task 6).

NOT for correctness runs — the driver's /root/testdata stays the only
correctness input.  This tool builds disjoint key "universes" so join
cardinalities and group counts scale the way a genuinely larger TPC-H
scale factor would:

- region/nation: copied (dimensions don't grow with sf),
- customer/supplier/part/orders/lineitem/events: each replica shifts
  every key column by replica_idx * (max_key + 1), keeping FK
  relationships intact within a universe,
- documents: replica 0 is the original; later replicas draw NEW texts
  from the original corpus's empirical word distribution with the
  original per-doc word counts (preserves near-dup statistics instead
  of creating 10x-denser MinHash bands from verbatim copies),
- embeddings: later replicas are the original unit vectors plus small
  gaussian noise, re-normalized (preserves IVF cluster structure while
  growing the corpus).

Usage: python tools/make_scale_data.py [src_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import duckdb
    import numpy as np

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(sql: str, table: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    def src_t(t: str) -> str:
        return f"'{src}/{t}.parquet'"

    # --- dimensions: copied as-is ---
    for t in ("region", "nation"):
        write(f"SELECT * FROM {src_t(t)}", t)

    # --- keyed tables: disjoint universes ---
    def stride(t: str, key: str) -> int:
        return (
            con.execute(f"SELECT max({key}) FROM {src_t(t)}").fetchone()[0]
            + 1
        )

    C = stride("customer", "c_custkey")
    S = stride("supplier", "s_suppkey")
    P = stride("part", "p_partkey")
    O = stride("orders", "o_orderkey")
    E = stride("events", "event_id")
    U = stride("events", "user_id")

    def replicate(table: str, shifts: dict[str, int]) -> None:
        parts = []
        for i in range(factor):
            sel = ", ".join(
                f"{c} + {i * k} AS {c}" if i else c for c, k in shifts.items()
            )
            others = con.execute(
                f"DESCRIBE SELECT * FROM {src_t(table)}"
            ).fetchall()
            rest = ", ".join(c[0] for c in others if c[0] not in shifts)
            parts.append(
                f"SELECT {sel}{', ' + rest if rest else ''} "
                f"FROM {src_t(table)}"
            )
        write(" UNION ALL ".join(parts), table)

    replicate("customer", {"c_custkey": C})
    replicate("supplier", {"s_suppkey": S})
    replicate("part", {"p_partkey": P})
    replicate("orders", {"o_orderkey": O, "o_custkey": C})
    replicate(
        "lineitem",
        {"l_orderkey": O, "l_partkey": P, "l_suppkey": S},
    )
    replicate("events", {"event_id": E, "user_id": U})

    # --- documents: fresh texts from the empirical word distribution ---
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM {src_t('documents')} "
        "ORDER BY doc_id"
    ).fetchall()
    D = max(r[0] for r in rows) + 1
    from collections import Counter

    wc = Counter(w for _, t, _, _ in rows for w in t.split())
    vocab = sorted(wc)
    probs = np.array([wc[w] for w in vocab], dtype=np.float64)
    probs /= probs.sum()
    out_rows = {
        "doc_id": [],
        "text": [],
        "lang": [],
        "source": [],
        "n_chars": [],
    }
    for i in range(factor):
        rng = np.random.RandomState(1000 + i)
        for doc_id, text, lang, source in rows:
            if i == 0:
                new_text = text
            else:
                n_words = len(text.split())
                new_text = " ".join(
                    rng.choice(vocab, size=n_words, p=probs)
                )
            out_rows["doc_id"].append(doc_id + i * D)
            out_rows["text"].append(new_text)
            out_rows["lang"].append(lang)
            out_rows["source"].append(source)
            out_rows["n_chars"].append(len(new_text))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_rows["doc_id"], pa.int64()),
                "text": pa.array(out_rows["text"], pa.string()),
                "lang": pa.array(out_rows["lang"], pa.string()),
                "source": pa.array(out_rows["source"], pa.string()),
                "n_chars": pa.array(out_rows["n_chars"], pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )
    print(f"documents: {len(out_rows['doc_id'])} rows")

    # --- embeddings: noised unit vectors, cluster labels kept ---
    erows = con.execute(
        f"SELECT vec_id, embedding, label FROM {src_t('embeddings')} "
        "ORDER BY vec_id"
    ).fetchall()
    V = max(r[0] for r in erows) + 1
    base = np.array([r[1] for r in erows], dtype=np.float64)
    ids = np.array([r[0] for r in erows], dtype=np.int64)
    labels = np.array([r[2] for r in erows], dtype=np.int32)
    all_ids, all_vecs, all_lab = [], [], []
    for i in range(factor):
        if i == 0:
            vecs = base
        else:
            rng = np.random.RandomState(2000 + i)
            vecs = base + rng.normal(0.0, 0.03, base.shape)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        all_ids.append(ids + i * V)
        all_vecs.append(vecs.astype(np.float32))
        all_lab.append(labels)
    flat = np.concatenate(all_vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(all_ids)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.reshape(-1)), flat.shape[1]
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(np.concatenate(all_lab)),
            }
        ),
        f"{out}/embeddings.parquet",
    )
    print(f"embeddings: {len(flat)} rows")


if __name__ == "__main__":
    main()
