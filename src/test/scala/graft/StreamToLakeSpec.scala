package graft

import graft.sources.LakeTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming → lake-table integration: a stream lands in the
  * snapshot-versioned table via foreachBatch + upsert (the Delta-style
  * "streaming MERGE sink"). Each micro-batch becomes one CoW commit,
  * so the table stays queryable (and time-travelable) between
  * batches, and re-delivered keys update in place instead of
  * duplicating — exactly-once table state over at-least-once input. */
class StreamToLakeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("stream lands in a HIDDEN-PARTITIONED table; pruning spans micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = "/tmp/graft_test/stream_lake_hidden"
    SparkSpec.rmdir(path)
    val spec = Seq(LakeTable.PartitionTransform("ts_s", "day"))
    val input = MemoryStream[(Long, Long, Double)]
    val query = input.toDS().toDF("k", "ts_s", "v")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        LakeTable.appendHiddenPartitioned(batch, path, spec)
        ()
      }
      .start()
    try {
      input.addData((1L, 0L, 1.0), (2L, 86400L, 2.0)) // days 0, 1
      query.processAllAvailable()
      input.addData((3L, 86401L, 3.0), (4L, 2 * 86400L, 4.0)) // days 1, 2
      query.processAllAvailable()
      val t = LakeTable.read(spark, path)
      assert(t.count() === 4)
      assert(!t.columns.exists(_.startsWith("__p_")), "layout stays hidden")
      // a day-1 interval prunes across BOTH batches' manifests and
      // reads exactly the two day-1 rows
      val day1 = LakeTable.readWhereBetween(spark, path, "ts_s", 86400, 2 * 86400 - 1)
      assert(day1.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
      val a = LakeTable.lastPlanAudit
      assert(a.filesKept < a.filesClaimed,
        s"day pruning must skip other days' files across batches: $a")
    } finally query.stop()
  }

  test("foreachBatch upserts micro-batches into the lake table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = "/tmp/graft_test/stream_lake"
    SparkSpec.rmdir(path)

    val input = MemoryStream[(Long, String, Double)]
    val query = input.toDS().toDF("id", "status", "score")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (LakeTable.latestVersion(path).isEmpty) LakeTable.overwrite(batch, path)
        else LakeTable.upsert(batch, path, "id")
        ()
      }
      .start()
    try {
      input.addData((1L, "new", 0.1), (2L, "new", 0.2))
      query.processAllAvailable()
      assert(LakeTable.read(spark, path).count() === 2)

      // batch 2: update key 1 (redelivery with new state), insert key 3
      input.addData((1L, "done", 0.9), (3L, "new", 0.3))
      query.processAllAvailable()

      val rows = LakeTable.read(spark, path).collect()
        .map(r => r.getAs[Long]("id") -> (r.getAs[String]("status"), r.getAs[Double]("score")))
        .toMap
      assert(rows === Map(
        1L -> ("done", 0.9), 2L -> ("new", 0.2), 3L -> ("new", 0.3)),
        s"upsert semantics violated: $rows")

      // each micro-batch was one commit: v0 overwrite + v1 merge, and
      // v0 is still time-travelable (pre-update state)
      val hist = LakeTable.history(spark, path).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(hist === Map(0 -> "overwrite", 1 -> "merge"))
      val v0 = LakeTable.read(spark, path, Some(0)).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
      assert(v0 === Map(1L -> "new", 2L -> "new"))
    } finally query.stop()
  }

  test("foreachBatch MoR-upserts: O(batch) commits, no base-file rewrite") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = "/tmp/graft_test/stream_lake_mor"
    SparkSpec.rmdir(path)

    val input = MemoryStream[(Long, String, Double)]
    val query = input.toDS().toDF("id", "status", "score")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the streaming-CDC sink shape that holds at 100 TB: each
        // micro-batch costs O(batch) — a delete file + a data file —
        // never a table rewrite
        if (LakeTable.latestVersion(path).isEmpty) LakeTable.overwrite(batch, path)
        else LakeTable.upsertMoR(batch, path, "id")
        ()
      }
      .start()
    try {
      input.addData((1L, "new", 0.1), (2L, "new", 0.2))
      query.processAllAvailable()
      val v0Files = LakeTable.read(spark, path).inputFiles.toSet

      input.addData((1L, "done", 0.9), (3L, "new", 0.3))
      query.processAllAvailable()
      input.addData((3L, "done", 1.0))
      query.processAllAvailable()

      val rows = LakeTable.read(spark, path).collect()
        .map(r => r.getAs[Long]("id") -> (r.getAs[String]("status"), r.getAs[Double]("score")))
        .toMap
      assert(rows === Map(
        1L -> ("done", 0.9), 2L -> ("new", 0.2), 3L -> ("done", 1.0)),
        s"MoR streaming upsert semantics violated: $rows")
      // base files were never rewritten across three commits
      assert(v0Files.subsetOf(LakeTable.read(spark, path).inputFiles.toSet),
        "MoR sink must not rewrite base files")
      // compaction folds the accumulated delete files; state unchanged
      LakeTable.compact(spark, path)
      val after = LakeTable.read(spark, path).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
      assert(after === Map(1L -> "done", 2L -> "new", 3L -> "done"))
    } finally query.stop()
  }
}
