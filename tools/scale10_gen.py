#!/usr/bin/env python3
"""Seeded 10x scale-up of the sf0.1 documents/embeddings corpus.

Replicates each source row 10 times (the original plus 9 mutated
copies) with deterministic, seed-derived mutations:

- documents: each copy rewrites ~5% of words (seeded by (rep, doc_id)),
  so a copy stays a near-dup of its source (Jaccard well above the 0.6
  pair threshold for most docs) — cross-copy near-dup CLUSTERS of size
  ~10 appear on top of the corpus's own near-dup structure, which is
  exactly the boilerplate-heavy regime the dedup family must survive.
- embeddings: each copy adds seeded N(0, 0.02) noise per component —
  copies sit at cosine ~0.99+ of their source, creating real near-dup
  pairs for the LSH/incremental paths.

ids offset by rep * 10_000_000 so copies never collide. Output goes to
<outdir>/documents.parquet and <outdir>/embeddings.parquet; run the
bench against it with SPARK_GRAFT_SF_DIR=<outdir>.

Usage: python3 tools/scale10_gen.py /root/testdata/sf0.1 /tmp/scale10/sf1.0 [reps]

`reps` defaults to 10; round 12 runs the fuse probes at reps=100
(documents 5,000 -> 500,000) -- the SCALE100 validation the member-cap
families owed one decade past the measured 10x regime.
"""
import hashlib
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPS = 10  # default; argv[3] overrides
OFFSET = 10_000_000
VOCAB = ["drift", "ember", "quarry", "lattice", "sonder", "veldt",
         "umbra", "cairn", "tessel", "brume", "skein", "warden"]


def seeded_rng(*parts):
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).digest()
    return np.random.default_rng(struct.unpack("<Q", h[:8])[0])


def mutate_text(text, rep, doc_id):
    if rep == 0:
        return text
    words = text.split(" ")
    rng = seeded_rng("doc", rep, doc_id)
    n_mut = max(1, len(words) // 20)  # ~5% of words
    for idx in rng.choice(len(words), size=min(n_mut, len(words)), replace=False):
        words[idx] = VOCAB[int(rng.integers(len(VOCAB)))]
    return " ".join(words)


def gen_documents(src, dst):
    t = pq.read_table(f"{src}/documents.parquet")
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    out = {name: [] for name in t.column_names}
    for rep in range(REPS):
        for i in range(t.num_rows):
            doc_id = cols["doc_id"][i]
            text = mutate_text(cols["text"][i], rep, doc_id)
            out["doc_id"].append(doc_id + rep * OFFSET)
            out["text"].append(text)
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            out["n_chars"].append(len(text))
    schema = t.schema
    pq.write_table(pa.table(out, schema=schema), f"{dst}/documents.parquet")
    print(f"documents: {t.num_rows} -> {len(out['doc_id'])}")


def gen_embeddings(src, dst):
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_pylist()
    embs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    ids_out, embs_out = [], []
    for rep in range(REPS):
        if rep == 0:
            noisy = embs
        else:
            rng = seeded_rng("emb", rep)
            noisy = embs + rng.normal(0.0, 0.02, embs.shape).astype(np.float32)
        ids_out.extend(v + rep * OFFSET for v in vec_ids)
        embs_out.extend(noisy)
    arr = pa.array([e.tolist() for e in embs_out],
                   type=t.schema.field("embedding").type)
    pq.write_table(
        pa.table({"vec_id": pa.array(ids_out, type=pa.int64()),
                  "embedding": arr}),
        f"{dst}/embeddings.parquet")
    print(f"embeddings: {len(vec_ids)} -> {len(ids_out)}")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 3:
        REPS = int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    gen_documents(src, dst)
    gen_embeddings(src, dst)
