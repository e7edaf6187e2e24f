"""Scale-rehearsal data generator: replicate a base testdata SF
directory K× with consistent per-key-space id offsets, preserving every
foreign-key relationship (each replica is a disjoint id universe;
nation/region keys are constant-size dims and stay shared). Timestamps
are written as TIMESTAMP_NS to match the driver parquet format exactly.

Usage: python tools/make_sf.py [base_dir] [out_dir] [k]
Default: /root/testdata/sf0.1 → /root/repo/testdata_sf1 at k=10 (≈sf1).

This exists for the sf1 scale rehearsal (r4 VERDICT item 6): the
replicated data is an ENGINE STRESS input — 10× rows, 10× duplicate
clusters for the dedup family — not a statistical TPC-H dataset. Do
not use it to calibrate selectivity-sensitive plans.
"""

from __future__ import annotations

import os
import sys

import duckdb

# (table, id column) per key space that must offset consistently
KEY_SPACES = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
}


def make_sf(base: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    off = {
        space: con.execute(
            f"SELECT max({col}) + 1 FROM read_parquet('{base}/{t}.parquet')"
        ).fetchone()[0]
        for space, (t, col) in KEY_SPACES.items()
    }

    def rep(table: str, select: str) -> None:
        src = f"read_parquet('{base}/{table}.parquet')"
        con.execute(
            f"COPY (SELECT {select} FROM {src} CROSS JOIN range({k}) r(i)) "
            f"TO '{out}/{table}.parquet' (FORMAT parquet)"
        )

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{base}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
    rep("customer", f"c_custkey + i*{off['cust']} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment")
    rep("supplier", f"s_suppkey + i*{off['supp']} AS s_suppkey, "
        "s_name, s_nationkey, s_acctbal")
    rep("part", f"p_partkey + i*{off['part']} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice")
    rep("orders", f"o_orderkey + i*{off['order']} AS o_orderkey, "
        f"o_custkey + i*{off['cust']} AS o_custkey, o_orderstatus, "
        "o_totalprice, CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate, "
        "o_orderpriority")
    rep("lineitem", f"l_orderkey + i*{off['order']} AS l_orderkey, "
        f"l_partkey + i*{off['part']} AS l_partkey, "
        f"l_suppkey + i*{off['supp']} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, "
        "CAST(l_shipdate AS TIMESTAMP_NS) AS l_shipdate")
    rep("events", f"event_id + i*{off['event']} AS event_id, "
        "CAST(ts AS TIMESTAMP_NS) AS ts, "
        f"user_id + i*{off['user']} AS user_id, event_type, value, props")
    rep("documents", f"doc_id + i*{off['doc']} AS doc_id, "
        "text, lang, source, n_chars")
    rep("embeddings", f"vec_id + i*{off['vec']} AS vec_id, embedding, label")
    print(f"wrote {out} (k={k}) offsets={off}")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_sf(base, out, k)
