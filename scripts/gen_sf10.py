"""Generate a 100x 'sf10' dataset in /tmp/sf10 by replicating /tmp/sf1
(itself 10x sf0.1 — run scripts/gen_sf1.py first) ten more times.

Same methodology as gen_sf1.py, one decade up: each replica K offsets
every 64-bit entity key by 100M*K (sf1 keys live below 100M, so
replicas stay disjoint and FK integrity holds); `documents` text
additionally suffixes every token with `_sK` (K>0) so cross-replica
3/5-grams stay disjoint and dedup/contamination work grows linearly
with the corpus, never quadratically with the replication trick.
nation/region/embeddings stay fixed (dimension tables). Used by
scripts/scale_spot_sf10.py for the SCALE.md 100x growth table.
"""
import duckdb

con = duckdb.connect()
SRC = "/tmp/sf1"
OUT = "/tmp/sf10"
OFF = 100_000_000


def rep(table, sql_per_k):
    parts = " UNION ALL ".join(sql_per_k(k) for k in range(10))
    con.execute(f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")


def main():
    import os

    os.makedirs(OUT, exist_ok=True)
    for t in ("nation", "region", "embeddings"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    rep("customer", lambda k: f"SELECT c_custkey + {OFF*k} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM read_parquet('{SRC}/customer.parquet')")
    rep("supplier", lambda k: f"SELECT s_suppkey + {OFF*k} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM read_parquet('{SRC}/supplier.parquet')")
    rep("part", lambda k: f"SELECT p_partkey + {OFF*k} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM read_parquet('{SRC}/part.parquet')")
    rep("orders", lambda k: f"SELECT o_orderkey + {OFF*k} AS o_orderkey, o_custkey + {OFF*k} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM read_parquet('{SRC}/orders.parquet')")
    rep("lineitem", lambda k: f"SELECT l_orderkey + {OFF*k} AS l_orderkey, l_partkey + {OFF*k} AS l_partkey, l_suppkey + {OFF*k} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM read_parquet('{SRC}/lineitem.parquet')")
    rep("events", lambda k: f"SELECT event_id + {OFF*k} AS event_id, ts, user_id + {OFF*k} AS user_id, event_type, value, props FROM read_parquet('{SRC}/events.parquet')")

    def doc_sql(k):
        if k == 0:
            return f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{SRC}/documents.parquet')"
        suff = f"array_to_string(list_transform(string_split(text, ' '), w -> w || '_s{k}'), ' ')"
        return (f"SELECT doc_id + {OFF*k} AS doc_id, {suff} AS text, lang, source, "
                f"CAST(length({suff}) AS BIGINT) AS n_chars "
                f"FROM read_parquet('{SRC}/documents.parquet')")

    rep("documents", doc_sql)


if __name__ == "__main__":
    main()
