#!/usr/bin/env python
"""Round-15 same-session alternating A/B for the LSH and BM25 index
BUILDS: old = three _lsh_band_rows/_bm25_postings passes from raw
documents (the round-14 shipped form), new = one checkpointed
full-corpus pass sliced per version (the round-15 form). Also proves
the committed version payloads are IDENTICAL row sets old vs new.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_index_builds_r15.py [n_pairs]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from docker_based_real_time_etl_project_spark.lakesnap import (  # noqa: E402
    snap_init, snap_merge, snap_read, snap_restore,
)
from docker_based_real_time_etl_project_spark.queries.dedup_q import (  # noqa: E402
    _lsh_band_rows, _lsh_nb,
)
from docker_based_real_time_etl_project_spark.queries.registry import table  # noqa: E402
from docker_based_real_time_etl_project_spark.queries.text import (  # noqa: E402
    _bm25_nb, _bm25_postings,
)
from docker_based_real_time_etl_project_spark.session import get_spark  # noqa: E402


def lsh_old(spark) -> str:
    out = tempfile.mkdtemp(prefix="ab_lsh_old_")
    nb = _lsh_nb(SF_DIR)
    d = table(spark, SF_DIR, "documents")
    assert snap_init(
        spark, _lsh_band_rows(d.filter("doc_id % 10 != 7"), nb), out,
        "bkt", sort_by=("band_hash", "doc_id"),
    ) == 1
    assert snap_merge(
        spark, out, _lsh_band_rows(d.filter("doc_id % 10 = 7"), nb),
        key_cols=("doc_id", "band_idx"), mode="mor",
    ) == 2
    wrong = _lsh_band_rows(d.filter("doc_id % 10 = 3"), nb).withColumn(
        "_del", F.lit(True)
    )
    assert snap_merge(
        spark, out, wrong, key_cols=("doc_id", "band_idx"),
        delete_col="_del", mode="mor",
    ) == 3
    assert snap_restore(spark, out, 2) == 4
    return out


def lsh_new(spark) -> str:
    out = tempfile.mkdtemp(prefix="ab_lsh_new_")
    nb = _lsh_nb(SF_DIR)
    d = table(spark, SF_DIR, "documents")
    rows = _lsh_band_rows(d, nb).localCheckpoint(eager=True)
    assert snap_init(
        spark, rows.filter("doc_id % 10 != 7"), out,
        "bkt", sort_by=("band_hash", "doc_id"),
    ) == 1
    assert snap_merge(
        spark, out, rows.filter("doc_id % 10 = 7"),
        key_cols=("doc_id", "band_idx"), mode="mor",
    ) == 2
    wrong = rows.filter("doc_id % 10 = 3").withColumn("_del", F.lit(True))
    assert snap_merge(
        spark, out, wrong, key_cols=("doc_id", "band_idx"),
        delete_col="_del", mode="mor",
    ) == 3
    assert snap_restore(spark, out, 2) == 4
    return out


def bm25_old(spark) -> str:
    out = tempfile.mkdtemp(prefix="ab_bm25_old_")
    nb = _bm25_nb(SF_DIR)
    d = table(spark, SF_DIR, "documents")
    base = d.filter("doc_id % 10 != 7")
    held = d.filter("doc_id % 10 = 7")

    def stats(docs) -> dict:
        row = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.size(F.filter(F.split("text", " "), lambda w: w != ""))
            ).alias("t"),
        ).head()
        return {"bm25_n_docs": int(row["n"]), "bm25_tot_dl": int(row["t"] or 0)}

    assert snap_init(
        spark, _bm25_postings(base, nb), out, "bucket",
        sort_by=("word", "doc_id"), meta={**stats(base), "bm25_nb": nb},
    ) == 1
    assert snap_merge(
        spark, out, _bm25_postings(held, nb), key_cols=("word", "doc_id"),
        mode="mor", meta={**stats(d), "bm25_nb": nb},
    ) == 2
    wrong = _bm25_postings(d.filter("doc_id % 10 = 3"), nb).withColumn(
        "_del", F.lit(True)
    )
    assert snap_merge(
        spark, out, wrong, key_cols=("word", "doc_id"), delete_col="_del",
        mode="mor", meta={**stats(d.filter("doc_id % 10 != 3")), "bm25_nb": nb},
    ) == 3
    assert snap_restore(spark, out, 2) == 4
    return out


def bm25_new(spark) -> str:
    out = tempfile.mkdtemp(prefix="ab_bm25_new_")
    nb = _bm25_nb(SF_DIR)
    d = table(spark, SF_DIR, "documents")
    post = _bm25_postings(d, nb).localCheckpoint(eager=True)
    dls = d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        .cast("bigint").alias("dl"),
    ).localCheckpoint(eager=True)

    def stats(pred: str | None) -> dict:
        sl = dls.filter(pred) if pred else dls
        row = sl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")).head()
        return {"bm25_n_docs": int(row["n"]), "bm25_tot_dl": int(row["t"] or 0)}

    assert snap_init(
        spark, post.filter("doc_id % 10 != 7"), out, "bucket",
        sort_by=("word", "doc_id"),
        meta={**stats("doc_id % 10 != 7"), "bm25_nb": nb},
    ) == 1
    assert snap_merge(
        spark, out, post.filter("doc_id % 10 = 7"), key_cols=("word", "doc_id"),
        mode="mor", meta={**stats(None), "bm25_nb": nb},
    ) == 2
    wrong = post.filter("doc_id % 10 = 3").withColumn("_del", F.lit(True))
    assert snap_merge(
        spark, out, wrong, key_cols=("word", "doc_id"), delete_col="_del",
        mode="mor", meta={**stats("doc_id % 10 != 3"), "bm25_nb": nb},
    ) == 3
    assert snap_restore(spark, out, 2) == 4
    return out


def versions_equal(spark, pa: str, pb: str, n_versions: int, cols) -> bool:
    from docker_based_real_time_etl_project_spark.lakesnap import snap_meta

    ok = True
    for v in range(1, n_versions + 1):
        a = snap_read(spark, pa, version=v).select(*cols)
        b = snap_read(spark, pb, version=v).select(*cols)
        d1 = a.exceptAll(b).count()
        d2 = b.exceptAll(a).count()
        if d1 or d2:
            print(f"  VERSION {v} DIFFERS: onlyA={d1} onlyB={d2}")
            ok = False
    ma, mb = snap_meta(pa), snap_meta(pb)
    for k in ("bm25_n_docs", "bm25_tot_dl", "bm25_nb"):
        if ma.get(k) != mb.get(k):
            print(f"  META {k} differs: {ma.get(k)} vs {mb.get(k)}")
            ok = False
    return ok


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-index-builds-r15")
    # warmup
    table(spark, SF_DIR, "documents").write.format("noop").mode("overwrite").save()

    # content-equality proof, once per family
    print("== content equality ==", flush=True)
    la, lb = lsh_old(spark), lsh_new(spark)
    print("lsh versions equal:",
          versions_equal(spark, la, lb, 4, ["bkt", "band_idx", "band_hash", "doc_id"]),
          flush=True)
    ba, bb = bm25_old(spark), bm25_new(spark)
    print("bm25 versions equal:",
          versions_equal(spark, ba, bb, 4, ["word", "doc_id", "tf", "dl", "bucket"]),
          flush=True)

    res: dict[str, list[float]] = {"lsh_old": [], "lsh_new": [],
                                   "bm25_old": [], "bm25_new": []}
    for i in range(n_pairs):
        for nm, fn in (("lsh_old", lsh_old), ("lsh_new", lsh_new),
                       ("bm25_old", bm25_old), ("bm25_new", bm25_new)):
            t0 = time.perf_counter()
            fn(spark)
            dt = round(time.perf_counter() - t0, 3)
            res[nm].append(dt)
            print(f"pair {i} {nm}: {dt}s", flush=True)
    print("RESULTS", {k: (min(v), v) for k, v in res.items()})


if __name__ == "__main__":
    main()
