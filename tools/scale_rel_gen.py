#!/usr/bin/env python3
"""Seeded relational scale-up (lineitem/orders/part) for the graph/ER
SCALE probes — the sibling of scale10_gen.py (which scales
documents/embeddings). Regimes are chosen per table for the HONEST
stress, not the trivially-parallel one:

- orders/lineitem: each rep offsets o_orderkey/l_orderkey (new
  transactions) and offsets o_custkey per rep block (new customers)
  while KEEPING l_suppkey (the fixed supplier space) — the co-purchase
  graph's supplier side becomes R x-degree hubs over an R x customer
  base: edges x R exactly, hub degree x R. This is the regime that
  breaks naive graph code (per-node state, window-per-node plans);
  disjoint-copy replication would test nothing.
- part: each rep offsets p_partkey and KEEPS p_name/p_type/p_size —
  per-name record multiplicity x R, so ER match pairs grow ~R^2: the
  mass-duplicate / entity-cluster-growth regime where the resolve
  stage is output-bound (the span-family analogy). Name MUTATION at
  this corpus's 2-token name scale would explode the lev dictionary's
  length bands instead (names are 7-11 chars; 180k variants land in 3
  buckets), which measures a corpus pathology, not the operator.

Usage: python3 tools/scale_rel_gen.py /root/testdata/sf0.1 OUTDIR REPS
Writes lineitem.parquet orders.parquet part.parquet into OUTDIR.
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

O_OFF = 100_000_000   # orderkey block per rep
C_OFF = 10_000_000    # custkey block per rep
P_OFF = 10_000_000    # partkey block per rep


def rep_table(tbl: pa.Table, reps: int, offsets: dict) -> pa.Table:
    import pyarrow.compute as pc
    chunks = []
    for rep in range(reps):
        cols = []
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in offsets and rep > 0:
                col = pc.add(col, offsets[name] * rep)
            cols.append(col)
        chunks.append(pa.table(dict(zip(tbl.column_names, cols))))
    return pa.concat_tables(chunks)


def main():
    src, out, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(out, exist_ok=True)
    orders = pq.read_table(f"{src}/orders.parquet")
    pq.write_table(rep_table(orders, reps,
        {"o_orderkey": O_OFF, "o_custkey": C_OFF}), f"{out}/orders.parquet")
    li = pq.read_table(f"{src}/lineitem.parquet")
    pq.write_table(rep_table(li, reps,
        {"l_orderkey": O_OFF}), f"{out}/lineitem.parquet")
    part = pq.read_table(f"{src}/part.parquet")
    pq.write_table(rep_table(part, reps,
        {"p_partkey": P_OFF}), f"{out}/part.parquet")
    print(f"[scale_rel_gen] {out}: orders x{reps}={orders.num_rows*reps}, "
          f"lineitem x{reps}={li.num_rows*reps}, part x{reps}={part.num_rows*reps}")


if __name__ == "__main__":
    main()
