"""Scale-honest embeddings fixtures (round-12 verdict item 5).

The shipped testdata's `embeddings` table is a fixed-size dimension
table across SFs (500 rows at sf0.001/sf0.01, 2000 at sf0.1, frozen by
gen_sf1/gen_sf10), so the vector-workload decade spots (q_kmeans_lloyd,
q_ann_ivf_persisted, q_dedup_semantic) were vacuous. This generator
produces embeddings-only scale dirs whose VECTOR COUNT grows a decade
per step:

    /tmp/vsf1  —  20,000 vectors (10x the sf0.1 table)
    /tmp/vsf10 — 200,000 vectors (100x)

Vectors are deterministic pseudo-random (DuckDB hash(i*64+d), uniform
in [-0.25, 0.25] — the same isotropic shape and value range as the
shipped fixture), 64-dim float32, label = vec_id % 10, ids dense from
0 so the k-means seeds (vec_id < K) and the planted SemDeDup twins
(vec_id % 7 / % 21) scale linearly with the corpus. Replication with
key offsets (the gen_sf10 trick) is WRONG for embeddings: replicated
vectors are exact cosine-1 duplicates of each other, which would hand
SemDeDup quadratic planted groups instead of scale-honest work.

Run: python scripts/gen_vec_sf.py
Consumed by scripts/scale_spot_vec_r13.py for the SCALE.md table.
"""
import os

import duckdb

con = duckdb.connect()


def gen(out: str, n: int) -> None:
    os.makedirs(out, exist_ok=True)
    con.execute(f"""
      COPY (
        SELECT CAST(i AS BIGINT) AS vec_id,
               list_transform(range(0, 64), d ->
                 CAST(CAST(hash(i * 64 + d) % 500001 AS DOUBLE) / 1e6
                      - 0.25 AS FLOAT)) AS embedding,
               CAST(i % 10 AS INT) AS label
        FROM range({n}) t(i)
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    print(f"{out}: {n} vectors")


if __name__ == "__main__":
    gen("/tmp/vsf1", 20_000)
    gen("/tmp/vsf10", 200_000)
