#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset by deterministic 10x key-shifted
replication of /root/testdata/sf0.1 (the driver ships sf0.001/0.01/0.1
only; the opt-in sf1 oracle sweep needs a 10x point).

Replication contract:
  - fact/dim tables replicate 10x with every key column shifted by
    replica*OFFSET, consistently across tables (orderkey shift identical
    in orders and lineitem, etc.), so joins, mod-N splits, and window
    semantics stay well-defined -- the oracle compare is self-consistent
    (DuckDB runs the same SQL on the same parquet), which is all the
    sweep needs.
  - region/nation keep 1x (fixed-cardinality dimensions, TPC-H style);
    nationkey references therefore stay unshifted.
  - values (prices, quantities, text, vectors, timestamps) are copied
    verbatim; pyarrow round-trips the exact physical schema, including
    events.ts TIMESTAMP(NANOS), which a Spark rewrite would rewrite as
    BIGINT under nanosAsLong.

Usage: python3 tools/gen_sf1.py [outdir]   (default /tmp/sf1_synth)
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
REPLICAS = 10
OFF = 100_000_000  # > every key domain at sf0.1 (max orderkey ~600k)

# table -> columns shifted by replica*OFF (consistent across tables)
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    for table, shift_cols in SHIFTS.items():
        t = pq.read_table(f"{SRC}/{table}.parquet")
        reps = 1 if not shift_cols else REPLICAS
        parts = []
        for i in range(reps):
            if i == 0 or not shift_cols:
                parts.append(t)
                continue
            cols = []
            for name in t.schema.names:
                c = t.column(name)
                if name in shift_cols:
                    shifted = pa.compute.add(
                        c.cast(pa.int64()), pa.scalar(i * OFF, pa.int64()))
                    cols.append(shifted.cast(t.schema.field(name).type))
                else:
                    cols.append(c)
            parts.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{OUT}/{table}.parquet")
        print(f"{table}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
