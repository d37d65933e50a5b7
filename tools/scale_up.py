#!/usr/bin/env python3
"""Up-scale /root/testdata/sf0.1 10x to a local sf1 for the scale
rehearsal (SCALE.md): replicate each table with key shifts so join
fan-outs and group cardinalities grow like a real scale-up —
10x orders/lineitem/supplier/customer/part/documents/events, with
foreign keys shifted consistently inside each replica. nation/region
stay fixed (TPC-H scaling rule). Documents get a replica salt token
appended so replicas are not byte-identical, but cross-replica
near-dup density DOES grow ~10x — treat dedup ratios as a
worst-case (heavily duplicated corpus) upper bound.

Driver-side tooling only (duckdb) — not part of the engine.
Usage: python3 tools/scale_up.py [out_dir] [factor]
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

con = duckdb.connect()


def base(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


def write(table, select_per_replica):
    sql = " UNION ALL ".join(select_per_replica(i) for i in range(K))
    con.execute(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")


import os

os.makedirs(OUT, exist_ok=True)

ok = base("orders", "o_orderkey")
sk = base("supplier", "s_suppkey")
ck = base("customer", "c_custkey")
pk = base("part", "p_partkey")
dk = base("documents", "doc_id")
ek = base("events", "event_id")
uk = base("events", "user_id")
vk = base("embeddings", "vec_id")

write("lineitem", lambda i: f"""
  SELECT l_orderkey + {i * ok} AS l_orderkey, l_partkey + {i * pk} AS l_partkey,
         l_suppkey + {i * sk} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

write("orders", lambda i: f"""
  SELECT o_orderkey + {i * ok} AS o_orderkey, o_custkey + {i * ck} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

write("supplier", lambda i: f"""
  SELECT s_suppkey + {i * sk} AS s_suppkey, s_name || '#r' || {i} AS s_name,
         s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")

write("customer", lambda i: f"""
  SELECT c_custkey + {i * ck} AS c_custkey, c_name || '#r' || {i} AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'""")

write("part", lambda i: f"""
  SELECT p_partkey + {i * pk} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM '{SRC}/part.parquet'""")

write("documents", lambda i: f"""
  SELECT doc_id + {i * dk} AS doc_id, text || ' r{i}salt' AS text, lang, source,
         n_chars + {2 + len(str(i)) + 4} AS n_chars
  FROM '{SRC}/documents.parquet'""")

write("events", lambda i: f"""
  SELECT event_id + {i * ek} AS event_id, ts, user_id + {i * uk} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet'""")

write("embeddings", lambda i: f"""
  SELECT vec_id + {i * vk} AS vec_id, * EXCLUDE (vec_id)
  FROM '{SRC}/embeddings.parquet'""")

for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")
print("done:", OUT)
