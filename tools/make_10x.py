#!/usr/bin/env python3
"""Build the 10x stress corpus used by SURVEY's scale-validation runs.

Layout: <out>/ gets symlinks to every sf0.1 table, then documents and
embeddings are replaced by 10x replicas where each row appears as 10
byte-identical copies under ids k*N + orig (k = 0..9). Keeping the
ORIGINAL ids in the k=0 slice preserves the eval-set semantics
(doc_id < 5, probe vec_id == 0), and byte-identical texts make the
corpus the adversarial case for dedup banding (90% duplicates).

Usage: python3 tools/make_10x.py [src_dir] [out_dir]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf10x)

Driver-side tooling only (pyarrow) — not part of the Spark library.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x"

LINKED = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events"]
REPLICATED = {"documents": "doc_id", "embeddings": "vec_id"}


def replicate(table_name: str, key: str) -> None:
    t = pq.read_table(f"{SRC}/{table_name}.parquet")
    n = t.num_rows
    idx = t.schema.get_field_index(key)
    parts = [t.set_column(idx, key, pc.add(t.column(key), k * n))
             for k in range(10)]
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{OUT}/{table_name}.parquet")
    print(f"{table_name}: {n} -> {big.num_rows} rows")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in LINKED:
        dst = f"{OUT}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(f"{SRC}/{t}.parquet", dst)
    for t, key in REPLICATED.items():
        replicate(t, key)
    print(f"10x corpus ready at {OUT}")


if __name__ == "__main__":
    main()
