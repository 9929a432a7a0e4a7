"""ACID properties of the manifest-based snapshot table
(glonassdatamining_spark/lakehouse.py): commit atomicity, optimistic
concurrency, snapshot isolation / time travel, and file-stats MERGE
pruning — the behaviors the g11 oracle hash can't see directly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from glonassdatamining_spark.lakehouse import CommitConflict, ManifestTable


def _mk(spark, tmp_path, n=1000, n_files=4):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")
    )
    return ManifestTable.create(spark, str(tmp_path / "t"), df, "k", n_files)


def test_create_then_recreate_conflicts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.current_version() == 1
    with pytest.raises(CommitConflict):
        ManifestTable.create(
            spark, t.root, spark.range(1).select(F.col("id").alias("k")), "k"
        )


def test_concurrent_commit_conflicts(spark, tmp_path):
    """Two writers staging against the same HEAD: the second publish
    of the same version number must fail, not overwrite."""
    t = _mk(spark, tmp_path)
    v = t.current_version()
    files = t._manifest(v)["files"]
    t._commit(files, "append", v + 1)
    with pytest.raises(CommitConflict):
        t._commit(files, "append", v + 1)


def test_uncommitted_file_is_invisible(spark, tmp_path):
    """Crash simulation: a data file that reached the data dir but
    whose manifest never published must not appear in any read."""
    t = _mk(spark, tmp_path, n=100)
    orphan = os.path.join(t._ddir, "orphan.parquet")
    spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("val")).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "o"))
    part = [p for p in os.listdir(str(tmp_path / "o")) if p.endswith(".parquet")][0]
    os.rename(str(tmp_path / "o" / part), orphan)
    assert t.read().count() == 100


def test_merge_prunes_by_file_stats(spark, tmp_path):
    """Keys 0..999 range-partitioned into 4 disjoint files; a merge
    touching only the contiguous band [10, 20] must rewrite exactly
    one file and carry the other three forward untouched."""
    t = _mk(spark, tmp_path, n=1000, n_files=4)
    before = {e["file"] for e in t._manifest(1)["files"]}
    src = spark.range(10, 21).select(
        F.col("id").alias("k"), F.lit(-1).cast("bigint").alias("val")
    )
    out = t.merge(src)
    assert out["files_rewritten"] == 1
    assert out["files_carried"] == 3
    after = {e["file"] for e in t._manifest(2)["files"]}
    assert len(before & after) == 3, "carried files must be the SAME files"
    got = t.read()
    assert got.count() == 1000, "pure update: row count unchanged"
    assert got.filter(F.col("val") == -1).count() == 11
    assert got.filter((F.col("k") >= 10) & (F.col("k") <= 20)).agg(
        F.max("val")
    ).collect()[0][0] == -1


def test_merge_inserts_new_keys(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, n_files=2)
    src = spark.range(95, 110).select(
        F.col("id").alias("k"), F.lit(7).cast("bigint").alias("val")
    )
    t.merge(src)
    assert t.read().count() == 110
    assert t.read().filter(F.col("val") == 7).count() == 15


def test_time_travel_snapshot_isolation(spark, tmp_path):
    """A v1 read AFTER later commits sees exactly v1 — byte-for-byte
    the same rows, even though the table has since doubled and been
    merged over."""
    t = _mk(spark, tmp_path, n=200)
    v1_rows = sorted(r["k"] for r in t.read(version=1).collect())
    t.append(
        spark.range(200, 400).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        )
    )
    t.merge(
        spark.range(50).select(
            F.col("id").alias("k"), F.lit(-5).cast("bigint").alias("val")
        )
    )
    assert t.current_version() == 3
    assert sorted(r["k"] for r in t.read(version=1).collect()) == v1_rows
    assert t.read(version=1).filter(F.col("val") == -5).count() == 0
    assert t.read(version=2).count() == 400
    assert t.read(version=3).filter(F.col("val") == -5).count() == 50


def test_history_reports_every_version(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100)
    t.append(
        spark.range(100, 150).select(
            F.col("id").alias("k"), F.col("id").alias("val")
        )
    )
    h = t.history()
    assert [x["op"] for x in h] == ["create", "append"]
    assert [x["n_rows"] for x in h] == [100, 150]
    assert all(x["n_files"] >= 1 for x in h)


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    from glonassdatamining_spark.lakehouse import compact

    t = _mk(spark, tmp_path, n=300, n_files=4)
    t.append(
        spark.range(300, 600).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        ),
        n_files=4,
    )
    assert len(t._manifest(2)["files"]) == 8
    before = sorted(r["k"] for r in t.read().collect())
    v = compact(t, n_files=2)
    assert v == 3
    assert len(t._manifest(3)["files"]) == 2
    assert sorted(r["k"] for r in t.read().collect()) == before
    # pre-compaction snapshots still readable (time travel intact)
    assert t.read(version=2).count() == 600


def test_expire_snapshots_gc_orphans(spark, tmp_path):
    import os as _os

    from glonassdatamining_spark.lakehouse import compact, expire_snapshots

    t = _mk(spark, tmp_path, n=200, n_files=4)
    compact(t, n_files=1)
    n_data_before = len(
        [f for f in _os.listdir(t._ddir) if f.endswith(".parquet")]
    )
    assert n_data_before == 5  # 4 original + 1 compacted
    out = expire_snapshots(t, keep_last=1)
    assert out["removed_manifests"] == 1
    assert out["removed_data_files"] == 4
    assert t.current_version() == 2
    assert t.read().count() == 200  # live snapshot untouched
