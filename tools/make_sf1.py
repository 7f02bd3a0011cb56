#!/usr/bin/env python3
"""Dev-only sf1 synthesizer — deterministic 10x replication of the
sf0.1 testdata (the ScaleStress.scala discipline, extended from the
three index tables to the WHOLE table set) so the full correctness
gate can run once at sf1: `graft.Verify <sf1dir>` + `check.py <sf1dir>`.

NOT part of the shipped library (same status as check.py).

Replication rules (FK-consistent):
 - region/nation/customer/supplier/part copy UNSCALED: they are the
   fixed-cardinality dimensions (gates hard-code e.g. 25 nations),
   and 10x the fact rows over the same dims is exactly what a real
   scale-up looks like.
 - orders/lineitem scale 10x with o_orderkey == l_orderkey shifted by
   the same per-copy offset, so the FK join is preserved; part/supp
   keys stay in the unscaled dims' range.
 - events scale 10x with shifted event_id (user_id unchanged: more
   events per user, the realistic shape).
 - documents scale 10x with shifted doc_id and a copy-distinct suffix
   token (so dedup/BM25 see near-dup content, not 10 exact clones).
 - embeddings scale 10x with shifted vec_id and one deterministic
   epsilon per copy on the first component (keeps ANN/k-means cells
   spread instead of 10-way ties).

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/graft-sf1data]
"""
import sys
import os
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf1data"
COPIES = 10
SHIFT = 100000000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def copy_table(name, select_for_copy=None):
    src = f"read_parquet('{SRC}/{name}.parquet')"
    if select_for_copy is None:
        q = f"SELECT * FROM {src}"
    else:
        q = " UNION ALL ".join(
            select_for_copy(c).replace("__SRC__", src)
            for c in range(COPIES))
    con.execute(f"COPY ({q}) TO '{DST}/{name}.parquet' (FORMAT parquet)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{name}.parquet')"
    ).fetchone()[0]
    print(f"{name}: {n} rows")


for t in ["region", "nation", "customer", "supplier", "part"]:
    copy_table(t)

copy_table("orders", lambda c: (
    f"SELECT o_orderkey + {c * SHIFT} AS o_orderkey, o_custkey, "
    f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    f"FROM __SRC__"))

copy_table("lineitem", lambda c: (
    f"SELECT l_orderkey + {c * SHIFT} AS l_orderkey, l_partkey, "
    f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
    f"FROM __SRC__"))

copy_table("events", lambda c: (
    f"SELECT event_id + {c * SHIFT} AS event_id, ts, user_id, "
    f"event_type, value, props FROM __SRC__"))

copy_table("documents", lambda c: (
    f"SELECT doc_id + {c * SHIFT} AS doc_id, "
    f"text || ' copytag{c} ' || CAST(doc_id AS VARCHAR) AS text, "
    f"lang, source, n_chars FROM __SRC__"))

copy_table("embeddings", lambda c: (
    f"SELECT vec_id + {c * SHIFT} AS vec_id, "
    f"list_transform(embedding, (x, i) -> CAST(CASE WHEN i = 1 "
    f"THEN x + {c} * 0.001 ELSE x END AS FLOAT)) AS embedding, "
    f"label FROM __SRC__"))

print(f"sf1 synthesized at {DST}")
