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

NOISY mode (optional 4th arg "noisy", VERDICT r08 next-#5): the default
clone shards make pair-emitter output quadratic in the factor (every
shard carries byte-identical embeddings and near-identical text), so
100x walls measure fixture mass, not operator work. Noisy shards keep
each shard's INTERNAL near-dup structure byte-exact while making
cross-shard pairs non-duplicates, so true-pair mass grows ~linearly:
  - embeddings: shard k>0 is rotated by a seeded random ORTHOGONAL
    matrix R_k — every within-shard cosine/dot is EXACTLY preserved
    (R_k^T R_k = I), while cross-shard cosines collapse to ~N(0, 1/dim);
  - documents: tokens with fnv(tok) % 4 != 0 are replaced by a
    deterministic function of (token, shard) — within-shard shared
    spans stay shared (the rule is position-independent), while
    cross-shard word-3-gram survival is (1/4)^3 ≈ 1.6% (jaccard
    ≈ 0.008, below d04's 0.02 keep threshold — a %3 rule left it at
    0.019, straddling the boundary) and 5-char-shingle Jaccard drops
    below every LSH band threshold.
Shard 0 stays byte-identical in both modes.

Usage: python3 tools/stress_gen.py <srcSfDir> <dstDir> <factor> [noisy]
"""
import sys
import numpy as np
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


def _fnv(s):
    h = 0xcbf29ce484222325
    for b in s.encode("utf-8", "surrogateescape"):
        h = ((h ^ b) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h


def _noisy_text(text, k):
    """Token-dependent, position-independent per-shard substitution."""
    if text is None:
        return None
    toks = text.split(" ")
    out = []
    for t in toks:
        h = _fnv(t)
        if t and h % 4 != 0:
            out.append("n%d" % ((h * 31 + k * 0x9E3779B9) % 10**8))
        else:
            out.append(t)
    return " ".join(out)


def _rotation(dim, k):
    """Seeded random orthogonal matrix (QR of a gaussian, sign-fixed)."""
    rng = np.random.RandomState(1000003 + k)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return (q * np.sign(np.diag(r))).astype(np.float64)


def _rotate_embeddings(shard, k):
    i = shard.schema.get_field_index("embedding")
    typ = shard.schema.field(i).type
    col = shard["embedding"].combine_chunks()
    mat = np.asarray(col.values).reshape(len(shard), -1).astype(np.float64)
    rot = (mat @ _rotation(mat.shape[1], k).T).astype(np.float32)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(rot.ravel()), mat.shape[1]) \
        if pa.types.is_fixed_size_list(typ) else \
        pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(shard) + 1) * mat.shape[1],
                               mat.shape[1], dtype=np.int32)),
            pa.array(rot.ravel()))
    return shard.set_column(i, shard.schema.field(i), arr.cast(typ))


def main(src, dst, factor, noisy=False):
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
                if noisy:
                    noised = pa.array(
                        [_noisy_text(v, k)
                         for v in shard["text"].to_pylist()],
                        type=shard.schema.field(i).type)
                    shard = shard.set_column(i, shard.schema.field(i), noised)
                # null text stays null (binary_join propagates nulls)
                tagged = pc.binary_join_element_wise(
                    shard["text"], pa.scalar(f"shard{k}"), " ")
                shard = shard.set_column(i, shard.schema.field(i), tagged)
            if t == "embeddings" and k > 0 and noisy:
                shard = _rotate_embeddings(shard, k)
            shards.append(shard)
        out = pa.concat_tables(shards)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         noisy=(len(sys.argv) > 4 and sys.argv[4] == "noisy"))
