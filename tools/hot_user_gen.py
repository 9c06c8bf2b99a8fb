#!/usr/bin/env python3
"""Plant ONE hot user into an events table (VERDICT r08 next-#6): a user
with `views` view events and `purchases` purchase events all inside one
hour, appended to the source events.parquet with fresh event/user ids.
This is the skew probe for the attribution operators: e26's sliding
range window re-accumulates its collect_list buffer per event row
(O(events x events-in-window) for the hot user), while e27's bucketed
equi-join is candidate-bounded by ~2 x views-per-2h per purchase —
the probe measures both on the same planted fixture.

Only events.parquet is written (the attribution queries read nothing
else); timestamps are generated in the SOURCE column's exact physical
type so Spark/DuckDB readers see one consistent table.

Usage: python3 tools/hot_user_gen.py <srcSfDir> <dstDir> <views> <purchases>
"""
import os
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc


def main(src, dst, views, purchases):
    os.makedirs(dst, exist_ok=True)
    t = pq.read_table(f"{src}/events.parquet")
    max_eid = pc.max(t["event_id"]).as_py()
    max_uid = pc.max(t["user_id"]).as_py()
    hot_uid = max_uid + 1
    ts_type = t.schema.field("ts").type
    unit = ts_type.unit  # 'us' or 'ns'
    per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    # hour window starting strictly after the source data's max ts, so the
    # hot user shares no window with organic events
    t0 = pc.max(t["ts"]).cast(pa.int64()).as_py() + 3600 * per_sec
    n = views + purchases
    # interleave purchases uniformly among the views; all n events spread
    # evenly across ONE hour (the attribution window width)
    step = (3600 * per_sec) // n
    rows = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
            "value": [], "props": []}
    every = max(1, n // max(1, purchases))
    np_, nv = 0, 0
    for i in range(n):
        is_p = (i % every == every - 1) and np_ < purchases
        rows["event_id"].append(max_eid + 1 + i)
        rows["ts"].append(t0 + i * step)
        rows["user_id"].append(hot_uid)
        rows["event_type"].append("purchase" if is_p else "view")
        rows["value"].append(1.0)
        rows["props"].append('{"k": 0}')
        if is_p:
            np_ += 1
        else:
            nv += 1
    extra = pa.table({
        "event_id": pa.array(rows["event_id"], pa.int64()),
        "ts": pa.array(rows["ts"], pa.int64()).cast(ts_type),
        "user_id": pa.array(rows["user_id"], pa.int64()),
        "event_type": pa.array(rows["event_type"], pa.string()),
        "value": pa.array(rows["value"], pa.float64()),
        "props": pa.array(rows["props"], pa.string()),
    }).select(t.column_names).cast(t.schema)
    out = pa.concat_tables([t.combine_chunks(), extra])
    pq.write_table(out, f"{dst}/events.parquet")
    print(f"hot user {hot_uid}: {nv} views + {np_} purchases in 1h; "
          f"{t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
