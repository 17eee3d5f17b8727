"""Synthesize an sf1-scale dataset (10x sf0.1) for the oracle gate.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md). The sf1 build
replicates sf0.1 with CONSISTENT key shifts so every intra-table and
cross-table invariant the queries rely on survives:

  * primary keys (o_orderkey, l_orderkey, c_custkey, s_suppkey,
    p_partkey, event_id, doc_id, vec_id) shift by copy * (max+1)
  * foreign keys shift by the SAME stride as their target's primary
    key, so referential integrity (lineitem->orders, orders->customer,
    lineitem->part/supplier, customer->nation) is exactly preserved
  * payload columns (url, text, lang, props, value, embeddings) are
    copied verbatim — duplicated urls/texts are realistic crawl
    duplication and exercise the dedup family at scale

region/nation are dimensions and copy as-is. embeddings replicate 3x
(not 10x): the brute-force pair ORACLES are O(n^2) in DuckDB, so their
cost bounds the verification, not the engine (the engine's scale path
is LSH-bucketed).

Output: /tmp/jss_sf1/{table}.parquet  (DuckDB, no Spark needed)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jss_sf1"
COPIES = 10
EMB_COPIES = 3


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS c")

    def stride(table: str, key: str) -> int:
        return con.sql(
            f"SELECT max({key}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]

    k_ord = stride("orders", "o_orderkey")
    k_cust = stride("customer", "c_custkey")
    k_supp = stride("supplier", "s_suppkey")
    k_part = stride("part", "p_partkey")
    k_event = stride("events", "event_id")
    k_doc = stride("documents", "doc_id")
    k_vec = stride("embeddings", "vec_id")

    plans = {
        "region": None,
        "nation": None,
        "customer": f"c_custkey + c * {k_cust} AS c_custkey",
        "supplier": f"s_suppkey + c * {k_supp} AS s_suppkey",
        "part": f"p_partkey + c * {k_part} AS p_partkey",
        "orders": (
            f"o_orderkey + c * {k_ord} AS o_orderkey, "
            f"o_custkey + c * {k_cust} AS o_custkey"
        ),
        "lineitem": (
            f"l_orderkey + c * {k_ord} AS l_orderkey, "
            f"l_partkey + c * {k_part} AS l_partkey, "
            f"l_suppkey + c * {k_supp} AS l_suppkey"
        ),
        "events": f"event_id + c * {k_event} AS event_id",
        "documents": f"doc_id + c * {k_doc} AS doc_id",
        "embeddings": f"vec_id + c * {k_vec} AS vec_id",
    }

    for table, shifted in plans.items():
        src = f"read_parquet('{SRC}/{table}.parquet')"
        out = f"{DST}/{table}.parquet"
        if shifted is None:
            con.sql(f"COPY (SELECT * FROM {src}) TO '{out}' (FORMAT PARQUET)")
        else:
            n_copies = EMB_COPIES if table == "embeddings" else COPIES
            shifted_cols = [s.split(" AS ")[1] for s in shifted.split(", ")]
            keep = ", ".join(
                c for c in con.sql(f"SELECT * FROM {src} LIMIT 0").columns
                if c not in shifted_cols
            )
            con.sql(
                f"COPY (SELECT {shifted}, {keep} "
                f"FROM {src}, (SELECT unnest(range({n_copies})) AS c) "
                f"ORDER BY c) TO '{out}' (FORMAT PARQUET)"
            )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
