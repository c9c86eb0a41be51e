package graft

import graft.sources.LakeTable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `snapshots` metadata table: per-version commit summary with
  * added/removed data-file deltas folded from the manifest lists —
  * the table an operator reads before trusting a snapshot. */
class SnapshotsMetaSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def summaries(p: String): Map[Int, Row] =
    LakeTable.snapshots(spark, p).collect()
      .map(r => r.getInt(0) -> r).toMap

  test("lifecycle summary: totals and added/removed deltas per commit") {
    val p = "/tmp/graft_test/snapmeta_basic"
    SparkSpec.rmdir(p)
    val df1 = (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    LakeTable.overwrite(df1.repartition(2), p) // v0: 2 files
    LakeTable.append(
      (100 until 160).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
        .repartition(3), p) // v1: +3 files
    LakeTable.deleteMoR(spark, p, "k", col("k") < 10L) // v2: +1 delete manifest
    val s = summaries(p)
    assert(s.keySet == Set(0, 1, 2))
    def longAt(v: Int, c: String): Long =
      s(v).getLong(s(v).fieldIndex(c))
    assert(s(0).getString(2) == "overwrite")
    assert(longAt(0, "total_data_files") == 2 &&
      longAt(0, "added_data_files") == 2 && longAt(0, "removed_data_files") == 0)
    assert(s(1).getString(2) == "append")
    assert(longAt(1, "total_data_files") == 5 &&
      longAt(1, "added_data_files") == 3 && longAt(1, "removed_data_files") == 0)
    assert(longAt(2, "total_delete_files") >= 1 &&
      longAt(2, "added_data_files") == 0 && longAt(2, "removed_data_files") == 0)
    // commit times are real and non-decreasing
    val ts = Seq(0, 1, 2).map(v => s(v).getLong(1))
    assert(ts.forall(_ > 0) && ts == ts.sorted)
    // a compacting rewrite both adds (the folded file) and removes
    LakeTable.compact(spark, p)
    val s2 = summaries(p)
    val r3 = s2(3)
    def l3(c: String): Long = r3.getLong(r3.fieldIndex(c))
    assert(l3("added_data_files") >= 1 && l3("removed_data_files") >= 5,
      s"compact must replace the small files: $r3")
  }

  test("metadata-only re-manifest reports ZERO churn (file granularity)") {
    // ANALYZE rewrites every manifest (new paths, same file sets): a
    // manifest-path diff would report the whole table as rewritten;
    // the commit-dir-count diff must report 0 added / 0 removed.
    val p = "/tmp/graft_test/snapmeta_analyze"
    SparkSpec.rmdir(p)
    LakeTable.overwrite(
      (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
        .repartition(3), p)
    LakeTable.analyzeNdv(spark, p, Seq("k"))
    val s = summaries(p)
    val r1 = s(1)
    def l1(c: String): Long = r1.getLong(r1.fieldIndex(c))
    assert(l1("added_data_files") == 0 && l1("removed_data_files") == 0,
      s"ANALYZE is metadata-only, must show zero data-file churn: $r1")
    assert(l1("total_data_files") == 3)
    // a file-granular partial carry removes exactly the dropped files
    LakeTable.delete(spark, p, col("k") < 5L)
    val s2 = summaries(p)
    val r2 = s2(2)
    def l2(c: String): Long = r2.getLong(r2.fieldIndex(c))
    assert(l2("removed_data_files") >= 1 &&
      l2("removed_data_files") + l2("total_data_files") >= 3,
      s"partial carry must count only the files that left: $r2")
  }

  test("expire collapses gaps: the previous LIVE version is the diff base") {
    val p = "/tmp/graft_test/snapmeta_expire"
    SparkSpec.rmdir(p)
    (0 until 4).foreach { i =>
      LakeTable.append(
        Seq((i.toLong, i * 1.0)).toDF("k", "v").repartition(1), p)
    }
    LakeTable.expireSnapshots(spark, p, retain = 2) // keeps v2, v3
    val s = summaries(p)
    assert(s.keySet == Set(2, 3))
    val r2 = s(2)
    // v2's diff base is "nothing live" — its whole list reads as added
    assert(r2.getLong(r2.fieldIndex("added_data_files"))
      == r2.getLong(r2.fieldIndex("total_data_files")))
  }

  test("catalog surface: SELECT over t.snapshots") {
    val root = "/tmp/graft_test/snapmeta_cat"
    SparkSpec.rmdir(root)
    spark.conf.set("spark.sql.catalog.snapc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.snapc.warehouse", root)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS snapc.db")
      spark.sql("CREATE TABLE snapc.db.t (k BIGINT, v DOUBLE) USING graftlake")
      spark.sql("INSERT INTO snapc.db.t VALUES (1, 1.0), (2, 2.0)")
      val rows = spark.sql(
        "SELECT version, operation, added_data_files FROM snapc.db.t.snapshots " +
          "ORDER BY version").collect()
      assert(rows.length == 2) // CREATE's v0 + the INSERT
      assert(rows.last.getString(1) == "append")
      assert(rows.last.getLong(2) >= 1)
    } finally {
      spark.conf.unset("spark.sql.catalog.snapc")
      spark.conf.unset("spark.sql.catalog.snapc.warehouse")
    }
  }

  test("partition-stats sidecar: incremental refresh equals the fold; warm path serves stats") {
    val p = "/tmp/graft_test/lake_partstats"
    graft.Util.rmRecursive(p)
    def snap(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long)] =
      df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    LakeTable.overwritePartitioned(
      (1L to 40L).map(i => (i, if (i % 2 == 0) "a" else "b", i * 1.0))
        .toDF("k", "part_key", "v"), p, "part_key") // v0
    val cold0 = snap(LakeTable.partitions(spark, p))
    assert(LakeTable.partitionsSourceByPath.get(p) === "manifests")
    assert(LakeTable.analyzePartitions(spark, p) === "full")
    assert(LakeTable.analyzePartitions(spark, p) === "current")
    assert(snap(LakeTable.partitions(spark, p)) === cold0)
    assert(LakeTable.partitionsSourceByPath.get(p) === "stats",
      "an exact-version sidecar must serve the rollup")
    // pure append: the refresh folds ONLY the delta, results identical
    LakeTable.append(
      (41L to 50L).map(i => (i, "c", i * 1.0)).toDF("k", "part_key", "v")
        .repartition(1), p) // v1 — unpartitioned files land in ""
    val cold1 = snap(LakeTable.partitions(spark, p)) // v0 sidecar ≠ v1: cold
    assert(LakeTable.partitionsSourceByPath.get(p) === "manifests")
    assert(LakeTable.analyzePartitions(spark, p) === "incremental")
    assert(snap(LakeTable.partitions(spark, p)) === cold1)
    assert(LakeTable.partitionsSourceByPath.get(p) === "stats")
    // a DELETE invalidates the append-only basis: full rebuild, and
    // the rebuilt sidecar still equals the live fold
    LakeTable.delete(spark, p, col("k") <= 10L) // v2
    val cold2 = snap(LakeTable.partitions(spark, p))
    assert(LakeTable.partitionsSourceByPath.get(p) === "manifests")
    assert(LakeTable.analyzePartitions(spark, p) === "full")
    assert(snap(LakeTable.partitions(spark, p)) === cold2)
    assert(LakeTable.partitionsSourceByPath.get(p) === "stats")
    // time travel serves the HISTORICAL sidecar (exact-version hit) —
    // and its content is the version's own fold, never the head's
    assert(snap(LakeTable.partitions(spark, p, Some(1))) === cold1)
    assert(LakeTable.partitionsSourceByPath.get(p) === "stats")
  }

  test("partition-stats sidecar crosses to parquet past the columnar threshold") {
    val p = "/tmp/graft_test/lake_partstats_wide"
    graft.Util.rmRecursive(p)
    def snap(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long)] =
      df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def sidecar(v: Int, ext: String): java.nio.file.Path =
      java.nio.file.Paths.get(s"$p/_graft_meta/v$v/partstats.$ext")
    LakeTable.withColumnarMetaThreshold(5) {
      // 8 partitions — past the scoped threshold: the materialization
      // must pick the PARQUET encoding via the distributed fold (the
      // driver probe is bounded at threshold+1 rows by construction)
      LakeTable.overwritePartitioned(
        (1L to 64L).map(i => (i, s"p${i % 8}", i * 1.0))
          .toDF("k", "part_key", "v"), p, "part_key") // v0
      val cold0 = snap(LakeTable.partitions(spark, p))
      assert(cold0.length === 8)
      assert(LakeTable.analyzePartitions(spark, p) === "full")
      assert(java.nio.file.Files.exists(sidecar(0, "parquet")),
        "a wide domain must persist as parquet")
      assert(!java.nio.file.Files.exists(sidecar(0, "json")),
        "never both encodings for one version")
      assert(LakeTable.analyzePartitions(spark, p) === "current")
      assert(snap(LakeTable.partitions(spark, p)) === cold0)
      assert(LakeTable.partitionsSourceByPath.get(p) === "stats",
        "the parquet sidecar must serve the rollup")
      // pure append of a NEW partition: the incremental merge reads
      // the parquet basis + folds only the delta, still distributed,
      // still parquet (9 partitions > threshold)
      LakeTable.append(
        (65L to 72L).map(i => (i, "p9", i * 1.0)).toDF("k", "part_key", "v")
          .repartition(1), p) // v1 — unpartitioned files land in ""
      val cold1 = snap(LakeTable.partitions(spark, p))
      assert(cold1.length === 9)
      assert(LakeTable.analyzePartitions(spark, p) === "incremental")
      assert(java.nio.file.Files.exists(sidecar(1, "parquet")))
      assert(snap(LakeTable.partitions(spark, p)) === cold1)
      assert(LakeTable.partitionsSourceByPath.get(p) === "stats")
    }
  }
}
