"""Compaction: preserves rows exactly, reduces file count, no-ops
below threshold, readers of the old listing unaffected (backup dir).
"""

from __future__ import annotations

import os
import tempfile

from docker_based_real_time_etl_project_spark.operators.maintenance import (
    compact_parquet_dir,
    compaction_plan,
    drop_compaction_backups,
)
from docker_based_real_time_etl_project_spark.sources.parquet import load_table


def _fragmented_copy(spark, sf_dir, n_files=32):
    out = os.path.join(tempfile.mkdtemp(prefix="compact_"), "events")
    load_table(spark, sf_dir, "events").repartition(n_files).write.parquet(out)
    return out


def test_compaction_preserves_rows(spark, sf_dir):
    path = _fragmented_copy(spark, sf_dir)
    before = spark.read.parquet(path)
    n_before = before.count()
    ids_before = before.selectExpr("sum(event_id)").collect()[0][0]

    res = compact_parquet_dir(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert res["compacted"] and res["n_files"] >= 32

    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert after.selectExpr("sum(event_id)").collect()[0][0] == ids_before
    assert compaction_plan(path)["n_files"] < res["n_files"]
    # backup dir still readable (old listings finish), then retention
    assert spark.read.parquet(res["backup"]).count() == n_before
    assert drop_compaction_backups(path) == 1


def test_compaction_noop_below_threshold(spark, sf_dir):
    path = _fragmented_copy(spark, sf_dir, n_files=4)
    res = compact_parquet_dir(spark, path, min_files=8)
    assert res["compacted"] is False
    assert compaction_plan(path)["n_files"] == 4


def test_lsh_index_restore_matters(spark, sf_dir):
    """q_lsh_index_persisted's version history must be load-bearing:
    the wrong v3 tombstone batch visibly loses the %10==3 docs' band
    rows (a stale read would lose their pairs), and the restored
    latest brings every band row back to the full-corpus v2 state."""
    from pyspark.sql import functions as F

    from docker_based_real_time_etl_project_spark.lakesnap import snap_read
    from docker_based_real_time_etl_project_spark.queries.dedup_q import (
        _lsh_index_snap,
    )

    path = _lsh_index_snap(spark, sf_dir)
    v3 = snap_read(spark, path, version=3)
    assert v3.filter(F.expr("doc_id % 10 = 3")).count() == 0
    latest = snap_read(spark, path)
    n3 = latest.filter(F.expr("doc_id % 10 = 3")).count()
    assert n3 > 0
    # full corpus: every doc carries exactly 16 band rows
    n_docs = latest.select("doc_id").distinct().count()
    assert latest.count() == 16 * n_docs


def test_stream_lsh_index_compaction_preserves_pairs(spark, sf_dir):
    """Operational close of the streamed LSH index: after 8
    version-per-batch MoR commits, compacting every partition must (a)
    materially shrink the files a full read opens (the debris was
    real), (b) retire all pending delete entries, and (c) leave the
    served pair set BIT-IDENTICAL — compaction is a physical rewrite,
    never a semantic event."""
    from docker_based_real_time_etl_project_spark.lakesnap import (
        _read_manifest,
        snap_compact_partitions,
        snap_files,
        snap_versions,
    )
    from docker_based_real_time_etl_project_spark.queries.dedup_q import (
        _lsh_index_stream_lake,
        _lsh_pairs_from_index,
    )

    lake = _lsh_index_stream_lake(spark, sf_dir)
    before = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in _lsh_pairs_from_index(spark, sf_dir, lake).collect()
    )
    m = _read_manifest(lake, max(snap_versions(lake)))
    parts = sorted({e["partition"] for e in m["entries"]})
    n_files_before = len(snap_files(lake))
    snap_compact_partitions(spark, lake, parts, target_rows_per_file=100_000)
    assert len(snap_files(lake)) < n_files_before
    assert not _read_manifest(lake, max(snap_versions(lake))).get("delete_entries")
    after = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in _lsh_pairs_from_index(spark, sf_dir, lake).collect()
    )
    assert after == before and len(before) > 0
