"""Generate a local sf1.0-scale measurement dataset (~10x sf0.1).

The driver's round-end MEASUREMENT runs at a driver-generated sf1.0
(BENCH_r05.json: "sf": 1.0) that is not present on disk here. This
tool extrapolates the three tables the bench reads (documents,
embeddings, events) from the read-only sf0.1 snapshot so optimization
before/after numbers can be taken at the scale the driver times:

- documents: 10 copies; copy c applies a per-copy VOCABULARY
  PERMUTATION (rotation by c of the corpus word list) to every word.
  Within a copy the near-dup/exact-dup cluster structure of sf0.1 is
  preserved exactly (consistent word mapping keeps relative shingle
  overlap); across copies the permutation decorrelates texts, so
  cluster counts scale ~10x like a naturally bigger corpus. Common
  words still appear in all copies, so global shingle document
  frequency scales ~10x too (the max_df cut bites harder — the same
  effect a real 10x corpus has).
- embeddings: copy 0 = original; copies 1-9 fresh unit-normalized
  gaussian float32 vectors (matches the corpus distribution: max pair
  cosine ~0.5, so no artificial near-dup floods).
- events: 10 copies with offset event_id; ts/user_id kept so window
  counts scale and the user skew profile is preserved.

Deterministic (fixed seeds). Output: /root/bigdata/sf1/ by default.
Measurement-only: nothing in the query paths reads this directory.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/bigdata/sf1"
COPIES = int(os.environ.get("BIGDATA_COPIES", "10"))


def documents() -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    d = t.to_pydict()
    n = len(d["doc_id"])
    vocab = sorted({w for txt in d["text"] for w in txt.split(" ") if w})
    print(f"documents: {n} rows, vocab={len(vocab)}")
    rng = np.random.default_rng(20260821)
    base_order = list(rng.permutation(len(vocab)))
    out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
    for c in range(COPIES):
        if c == 0:
            mapping = None
        else:
            # rotation by c of the shuffled vocab order: a permutation,
            # consistent across all docs of the copy
            mapping = {
                vocab[base_order[i]]: vocab[base_order[(i + c) % len(vocab)]]
                for i in range(len(vocab))
            }
        for i in range(n):
            txt = d["text"][i]
            if mapping is not None:
                txt = " ".join(mapping.get(w, w) for w in txt.split(" "))
            out["doc_id"].append(d["doc_id"][i] + c * n)
            out["text"].append(txt)
            out["lang"].append(d["lang"][i])
            out["source"].append(d["source"][i])
            out["n_chars"].append(len(txt))
    tbl = pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{OUT}/documents.parquet")
    print(f"  -> {tbl.num_rows} rows")


def embeddings() -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = t["embedding"].to_pylist()
    labels = np.array(t["label"].to_pylist(), dtype=np.int32)
    n, dim = len(ids), len(emb[0])
    rng = np.random.default_rng(20260822)
    all_ids, all_vecs, all_labels = [ids], [np.array(emb, dtype=np.float32)], [labels]
    for c in range(1, COPIES):
        v = rng.standard_normal((n, dim))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        all_ids.append(ids + c * n)
        all_vecs.append(v.astype(np.float32))
        all_labels.append(rng.integers(0, 10, n).astype(np.int32))
    vecs = np.concatenate(all_vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(all_ids)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(all_labels)),
        }
    )
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")
    print(f"embeddings -> {tbl.num_rows} rows, dim={dim}")


def events() -> None:
    t = pq.read_table(f"{SRC}/events.parquet")
    n = t.num_rows
    parts = []
    for c in range(COPIES):
        p = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pa.compute.add(t["event_id"], c * n),
        )
        parts.append(p)
    tbl = pa.concat_tables(parts)
    pq.write_table(tbl, f"{OUT}/events.parquet")
    print(f"events -> {tbl.num_rows} rows")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    documents()
    embeddings()
    events()
    # bench.py warms up at the sibling sf0.001 dir of SF_DIR
    sib = os.path.join(os.path.dirname(OUT.rstrip("/")), "sf0.001")
    if not os.path.exists(sib):
        os.symlink("/root/testdata/sf0.001", sib)
    print("done:", OUT)


if __name__ == "__main__":
    main()
