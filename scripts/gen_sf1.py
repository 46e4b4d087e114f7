#!/usr/bin/env python3
"""Generate an sf1 slice (10x sf0.1) for local scale spot-runs.

NOT driver data — the driver's generator is not available, so sf1 is a
deterministic 10x extension of the committed sf0.1 tables with the
scaling semantics each table family needs:

- lineitem/orders: replicated 10x with a consistent l_orderkey /
  o_orderkey offset (the fact tables grow; the same customer base
  places 10x the orders — keys keep joining).
- documents: replicated 10x with DISJOINT vocabularies per replica
  (every word prefixed `r{i}_` for i>0), so each replica keeps the
  original's internal near-dup structure but replicas never near-match
  each other: near-dup pair volume scales LINEARLY with the corpus,
  which is the regime the linearity claims are about. (Plain
  replication would instead add 10 exact copies per doc and grow the
  output-bound dedup tier quadratically — a different, saturated task.)
- events: 10x with offset event_id / user_id (+ the same window
  structure getting 10x denser).
- embeddings: 10x with offset vec_id (same vectors; labels keep their
  distribution).
- dims (region/nation/customer/supplier/part): unchanged.

Usage: python3 scripts/gen_sf1.py [outdir]   (default /root/repo/target/sf1)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
REPLICAS = 10

import os

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


def copy(name):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
    )
    print(f"{name}: copied")


def scaled(name, select_i):
    parts = " UNION ALL ".join(select_i(i) for i in range(REPLICAS))
    con.execute(f"COPY ({parts}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


for t in ["region", "nation", "customer", "supplier", "part"]:
    copy(t)

K_ORD = con.execute(
    f"SELECT MAX(o_orderkey) + 1 FROM '{SRC}/orders.parquet'"
).fetchone()[0]
def keyed_replica(table, key):
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]

    def f(i):
        sel = ", ".join(
            f"{c} + {i * K_ORD} AS {c}" if c == key else c for c in cols)
        return f"SELECT {sel} FROM '{SRC}/{table}.parquet'"

    return f


scaled("orders", keyed_replica("orders", "o_orderkey"))
scaled("lineitem", keyed_replica("lineitem", "l_orderkey"))

K_DOC = con.execute(
    f"SELECT MAX(doc_id) + 1 FROM '{SRC}/documents.parquet'"
).fetchone()[0]


def doc_replica(i):
    if i == 0:
        return f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'"
    return f"""SELECT doc_id + {i * K_DOC} AS doc_id,
        'r{i}_' || replace(text, ' ', ' r{i}_') AS text,
        lang, source,
        CAST(length('r{i}_' || replace(text, ' ', ' r{i}_')) AS BIGINT) AS n_chars
      FROM '{SRC}/documents.parquet'"""


scaled("documents", doc_replica)

K_EV = con.execute(
    f"SELECT MAX(event_id) + 1 FROM '{SRC}/events.parquet'"
).fetchone()[0]
ev_cols = [c[0] for c in con.execute(
    f"DESCRIBE SELECT * FROM '{SRC}/events.parquet'").fetchall()]
print("events cols:", ev_cols)


def ev_replica(i):
    sel = ", ".join(
        f"event_id + {i * K_EV} AS event_id" if c == "event_id"
        else (f"user_id + {i * 1000000} AS user_id" if c == "user_id" else c)
        for c in ev_cols
    )
    return f"SELECT {sel} FROM '{SRC}/events.parquet'"


scaled("events", ev_replica)

K_VEC = con.execute(
    f"SELECT MAX(vec_id) + 1 FROM '{SRC}/embeddings.parquet'"
).fetchone()[0]
emb_cols = [c[0] for c in con.execute(
    f"DESCRIBE SELECT * FROM '{SRC}/embeddings.parquet'").fetchall()]
print("embeddings cols:", emb_cols)


def emb_replica(i):
    sel = ", ".join(
        f"vec_id + {i * K_VEC} AS vec_id" if c == "vec_id" else c for c in emb_cols
    )
    return f"SELECT {sel} FROM '{SRC}/embeddings.parquet'"


scaled("embeddings", emb_replica)
print("done ->", OUT)
