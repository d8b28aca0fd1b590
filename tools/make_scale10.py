#!/usr/bin/env python3
"""Build a 10x replica of an sf directory for scale benching (dev tool,
driver-side only — never a library dependency).

Each replica shifts every key column by i * K (K = a round multiple of
the key's max, multiples of 8 for user_id so sid = user_id % 8 keeps its
distribution), so cardinalities and join relationships scale ~linearly
while dimension tables (region, nation) stay fixed. Usage:

    python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/sf1x10 10
"""
import sys

import duckdb


def main(src: str, dst: str, factor: int) -> None:
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT * FROM range({factor}) t(i)")

    def keyspan(table: str, col: str, mult: int = 1) -> int:
        k = con.execute(
            f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]
        return ((k + mult - 1) // mult) * mult

    C = keyspan("customer", "c_custkey")
    S = keyspan("supplier", "s_suppkey")
    P = keyspan("part", "p_partkey")
    O = keyspan("orders", "o_orderkey")
    U = keyspan("events", "user_id", 8)
    E = keyspan("events", "event_id")
    D = keyspan("documents", "doc_id")
    V = keyspan("embeddings", "vec_id")

    plans = {
        "region": "SELECT * FROM '{src}/region.parquet'",
        "nation": "SELECT * FROM '{src}/nation.parquet'",
        "customer": f"SELECT c_custkey + i*{C} AS c_custkey, c_name, c_nationkey,"
                    " c_acctbal, c_mktsegment FROM '{src}/customer.parquet', reps",
        "supplier": f"SELECT s_suppkey + i*{S} AS s_suppkey, s_name, s_nationkey,"
                    " s_acctbal FROM '{src}/supplier.parquet', reps",
        "part": f"SELECT p_partkey + i*{P} AS p_partkey, p_name, p_brand, p_type,"
                " p_size, p_retailprice FROM '{src}/part.parquet', reps",
        "orders": f"SELECT o_orderkey + i*{O} AS o_orderkey, o_custkey + i*{C} AS"
                  " o_custkey, o_orderstatus, o_totalprice, o_orderdate,"
                  " o_orderpriority FROM '{src}/orders.parquet', reps",
        "lineitem": f"SELECT l_orderkey + i*{O} AS l_orderkey, l_partkey + i*{P} AS"
                    f" l_partkey, l_suppkey + i*{S} AS l_suppkey, l_linenumber,"
                    " l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
                    " l_linestatus, l_shipdate FROM '{src}/lineitem.parquet', reps",
        "events": f"SELECT event_id + i*{E} AS event_id, ts, user_id + i*{U} AS"
                  " user_id, event_type, value, props FROM"
                  " '{src}/events.parquet', reps",
        "documents": f"SELECT doc_id + i*{D} AS doc_id, text, lang, source,"
                     " n_chars FROM '{src}/documents.parquet', reps",
        "embeddings": f"SELECT vec_id + i*{V} AS vec_id, embedding, label FROM"
                      " '{src}/embeddings.parquet', reps",
    }
    for table, sql in plans.items():
        q = sql.format(src=src)
        # events.ts is TIMESTAMP(MICROS) without UTC adjustment since the
        # round-11 testdata regeneration — DuckDB's naive TIMESTAMP writes
        # back as exactly that type, so the replica round-trips with no
        # special-casing. (The pre-round-11 source was TIMESTAMP(NANOS)
        # and needed a pyarrow detour to avoid a silent µs downgrade;
        # if the driver ever regenerates at ns precision again, restore
        # that path from git history.)
        con.execute(f"COPY ({q}) TO '{dst}/{table}.parquet'"
                    " (FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
