#!/usr/bin/env python3
"""Generate a FACTOR-times-scaled copy of an sf directory for the stress
gate (VERDICT r03 next-round #1): union FACTOR shard copies of each
table, remapping every primary/foreign key by a per-shard stride so each
shard is a self-consistent sub-universe (joins hit only within-shard
rows, exactly like TPC-H scaling). Dimension tables (region, nation)
stay single-copy, and nationkey references are NOT remapped, so the
star-join shape is preserved.

Shard 0 keeps the original ids byte-for-byte — the ANN oracles'
"first-N rows in id order" codebooks are therefore identical at every
factor. Document text in shards k>0 gets a distinct trailing token, so
the corpus grows with NEW near-dup-structured content instead of
10-way exact clones (d01's digest groups would otherwise collapse the
whole corpus; near-dup caps still face clone-heavy buckets via the
unchanged embeddings).

pyarrow (not Spark) so physical parquet types survive verbatim — the
events table is TIMESTAMP(NANOS), which a Spark rewrite would demote
to INT64 and break both Tables.events and the DuckDB oracles.

Usage: python3 tools/stress_gen.py <srcSfDir> <dstDir> <factor>
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

PLAIN = ["region", "nation"]

# table -> {column -> stride symbol}; the symbol's stride is
# max(owning key)+1 so remapped ranges never collide
# documents.doc_id and embeddings.vec_id share ONE stride symbol: the
# doc_id = vec_id identity is load-bearing (j01 joins on it), so the
# two tables must shift in lockstep or shard-k embeddings would join
# shard-0's unrelated documents
REMAP = {
    "customer":   {"c_custkey": "C"},
    "supplier":   {"s_suppkey": "S"},
    "part":       {"p_partkey": "P"},
    "orders":     {"o_orderkey": "O", "o_custkey": "C"},
    "lineitem":   {"l_orderkey": "O", "l_partkey": "P", "l_suppkey": "S"},
    "events":     {"event_id": "E", "user_id": "U"},
    "documents":  {"doc_id": "D"},
    "embeddings": {"vec_id": "D"},
}
STRIDE_OWNER = {
    "C": [("customer", "c_custkey")], "S": [("supplier", "s_suppkey")],
    "P": [("part", "p_partkey")], "O": [("orders", "o_orderkey")],
    "E": [("events", "event_id")], "U": [("events", "user_id")],
    "D": [("documents", "doc_id"), ("embeddings", "vec_id")],
}


def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    base = {t: pq.read_table(f"{src}/{t}.parquet")
            for t in PLAIN + sorted(REMAP)}
    stride = {sym: max(pc.max(base[t][col]).as_py() for t, col in owners) + 1
              for sym, owners in STRIDE_OWNER.items()}
    print("strides:", stride)

    for t in PLAIN:
        pq.write_table(base[t], f"{dst}/{t}.parquet")
        print(f"{t}: copied {base[t].num_rows} rows")

    for t in sorted(REMAP):
        tbl = base[t]
        shards = []
        for k in range(factor):
            shard = tbl
            for col, sym in REMAP[t].items():
                i = shard.schema.get_field_index(col)
                typ = shard.schema.field(i).type
                shifted = pc.add(shard[col], pa.scalar(k * stride[sym], typ))
                shard = shard.set_column(i, shard.schema.field(i), shifted)
            if t == "documents" and k > 0:
                i = shard.schema.get_field_index("text")
                # null text stays null (binary_join propagates nulls)
                tagged = pc.binary_join_element_wise(
                    shard["text"], pa.scalar(f"shard{k}"), " ")
                shard = shard.set_column(i, shard.schema.field(i), tagged)
            shards.append(shard)
        out = pa.concat_tables(shards)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
