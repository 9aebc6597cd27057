#!/usr/bin/env python3
"""Stage a ~sf1 dataset (10x sf0.1) for the scaling probe (dev tooling,
driver-side python like parity.py; the shipped library never depends on it).

Method: union the base tables with key-shifted copies so join integrity is
preserved within each copy (fact keys shift by copy_index * (max_key+1);
shared small dimensions region/nation and the bounded user_id domain stay
fixed, mirroring how real corpora grow: more facts, same dimensions).

events.ts is materialized as epoch-ns BIGINT regardless of the source
generation (ns INT64 originally, plain microsecond TIMESTAMP since the
round-10 regen — epoch_ns() is exact for both): the schema-adaptive
Tables.events/EventStream readers take their LongType branch and land on
the same normalized values as the base table.

Usage: tools/make_sf1.py [base_dir] [out_dir] [copies]
"""
import sys
import duckdb

base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfprobe"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
import os
os.makedirs(out, exist_ok=True)

def write(name, sql):
    con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

# fixed dimensions
for t in ["region", "nation"]:
    write(t, f"SELECT * FROM '{base}/{t}.parquet'")

def mx(table, col):
    return con.execute(f"SELECT max({col})+1 FROM '{base}/{table}.parquet'").fetchone()[0]

C, S, P, O = mx("customer", "c_custkey"), mx("supplier", "s_suppkey"), \
             mx("part", "p_partkey"), mx("orders", "o_orderkey")
E, D, V = mx("events", "event_id"), mx("documents", "doc_id"), \
          mx("embeddings", "vec_id")
ks = f"(SELECT unnest(range({copies})) AS k)"

write("customer", f"""
  SELECT c_custkey + k*{C} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{base}/customer.parquet' CROSS JOIN {ks}""")
write("supplier", f"""
  SELECT s_suppkey + k*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{base}/supplier.parquet' CROSS JOIN {ks}""")
write("part", f"""
  SELECT p_partkey + k*{P} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{base}/part.parquet' CROSS JOIN {ks}""")
write("orders", f"""
  SELECT o_orderkey + k*{O} AS o_orderkey, o_custkey + k*{C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{base}/orders.parquet' CROSS JOIN {ks}""")
write("lineitem", f"""
  SELECT l_orderkey + k*{O} AS l_orderkey, l_partkey + k*{P} AS l_partkey,
         l_suppkey + k*{S} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{base}/lineitem.parquet' CROSS JOIN {ks}""")
write("events", f"""
  SELECT event_id + k*{E} AS event_id, epoch_ns(ts) AS ts, user_id,
         event_type, value, props
  FROM '{base}/events.parquet' CROSS JOIN {ks}""")
write("documents", f"""
  SELECT doc_id + k*{D} AS doc_id, text, lang, source, n_chars
  FROM '{base}/documents.parquet' CROSS JOIN {ks}""")
write("embeddings", f"""
  SELECT vec_id + k*{V} AS vec_id, embedding, label
  FROM '{base}/embeddings.parquet' CROSS JOIN {ks}""")
print("done ->", out)
