package graft

import graft.sources.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The append-following TABLE stream
  * (`spark.readStream.format("graftlake").load(path)`): per-version
  * batches, checkpoint resume, the non-append refusal contract, and
  * the full lake-to-lake loop (graftlake source → graftlake sink). */
class TableStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def rows(from: Int, n: Int): DataFrame =
    (from until from + n).map(i => (i.toLong, i * 2.0)).toDF("id", "x")

  private def drain(table: String, out: String, chk: String,
      opts: Map[String, String] = Map.empty): Int = {
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = spark.readStream.format("graftlake")
    opts.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(table)
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) batches.incrementAndGet()
        b.write.mode("append").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches.get()
  }

  test("appends arrive one version per batch; restart resumes past committed offsets") {
    val root = "/tmp/graft_tstream_e2e"
    SparkSpec.rmdir(root)
    val (table, out, chk) = (s"$root/t", s"$root/out", s"$root/chk")
    LakeTable.overwrite(rows(0, 10), table)   // v0: initial snapshot
    LakeTable.append(rows(10, 5), table)      // v1
    LakeTable.append(rows(15, 5), table)      // v2

    assert(drain(table, out, chk) === 3, "v0..v2 must arrive as three batches")
    assert(spark.read.parquet(out).select(countDistinct("id")).head().getLong(0) === 20)

    LakeTable.append(rows(20, 7), table)      // v3 after the first drain
    assert(drain(table, out, chk) === 1, "resume delivers only the new version")
    val all = spark.read.parquet(out)
    assert(all.count() === 27)
    assert(all.select(countDistinct("id")).head().getLong(0) === 27)
  }

  test("maxVersionsPerTrigger batches several versions, offsets stay version-aligned") {
    val root = "/tmp/graft_tstream_maxv"
    SparkSpec.rmdir(root)
    val (table, out, chk) = (s"$root/t", s"$root/out", s"$root/chk")
    LakeTable.overwrite(rows(0, 4), table) // v0
    (1 to 4).foreach(i => LakeTable.append(rows(i * 10, 3), table)) // v1..v4
    // 5 versions at 2 per trigger → ceil(5/2) = 3 non-empty batches
    assert(drain(table, out, chk, Map("maxVersionsPerTrigger" -> "2")) === 3,
      "five versions at two per trigger drain in three batches")
    assert(spark.read.parquet(out).count() === 16, "every row exactly once")
    // a later catch-up keeps the knob; resume is version-aligned
    LakeTable.append(rows(100, 2), table) // v5
    LakeTable.append(rows(200, 2), table) // v6
    LakeTable.append(rows(300, 2), table) // v7
    assert(drain(table, out, chk, Map("maxVersionsPerTrigger" -> "2")) === 2,
      "three new versions at two per trigger drain in two batches")
    assert(spark.read.parquet(out).count() === 22)
    val e = intercept[Exception](
      drain(table, out, s"$chk-bad", Map("maxVersionsPerTrigger" -> "0")))
    assert(e.getMessage.contains("maxVersionsPerTrigger"), e.getMessage)
  }

  test("a CTAS-created table streams its v0 snapshot like any initial overwrite") {
    val root = "/tmp/graft_tstream_ctas"
    SparkSpec.rmdir(root)
    val (wh, out, chk) = (s"$root/wh", s"$root/out", s"$root/chk")
    spark.conf.set("spark.sql.catalog.tsctas", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tsctas.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tsctas.db")
      spark.sql("CREATE TABLE tsctas.db.t USING graftlake AS " +
        "SELECT id, CAST(id * 2.0 AS DOUBLE) AS x FROM range(0, 25)")
      val table = s"$wh/db/t"
      assert(drain(table, out, chk) === 1, "the ctas v0 is the snapshot batch")
      assert(spark.read.parquet(out).count() === 25)
      LakeTable.append(rows(25, 5).toDF("id", "x"), table)
      assert(drain(table, out, chk) === 1)
      assert(spark.read.parquet(out).count() === 30)
    } finally {
      spark.conf.unset("spark.sql.catalog.tsctas")
      spark.conf.unset("spark.sql.catalog.tsctas.warehouse")
    }
  }

  test("maintenance and metadata commits arrive as empty batches, not stream death") {
    val root = "/tmp/graft_tstream_meta"
    SparkSpec.rmdir(root)
    val (table, out, chk) = (s"$root/t", s"$root/out", s"$root/chk")
    LakeTable.overwrite(rows(0, 10), table)             // v0
    assert(drain(table, out, chk) === 1)
    LakeTable.addConstraint(spark, table, "pos_x", "x >= 0") // v1: metadata only
    LakeTable.append(rows(10, 5), table)                // v2
    LakeTable.compact(spark, table)                     // v3: row-preserving rewrite
    LakeTable.addColumn(spark, table, "extra")          // v4: metadata only
    LakeTable.append(rows(15, 5).withColumn("extra", lit("e")), table) // v5
    // v1/v3/v4 deliver empty; v2/v5 carry rows — follower never dies
    assert(drain(table, out, chk) === 2,
      "exactly the two append versions carry rows")
    val all = spark.read.parquet(out)
    assert(all.select(countDistinct("id")).head().getLong(0) === 20)
  }

  test("a rollback commit (no fresh manifests, rows removed) still refuses loudly") {
    val root = "/tmp/graft_tstream_rb"
    SparkSpec.rmdir(root)
    val (table, out, chk) = (s"$root/t", s"$root/out", s"$root/chk")
    LakeTable.overwrite(rows(0, 10), table)   // v0
    LakeTable.append(rows(10, 5), table)      // v1
    assert(drain(table, out, chk) === 2)
    // v2 re-references v0's manifests exactly — zero fresh manifests,
    // but the table LOST v1's rows: an empty batch would silently
    // diverge the follower, so it must die instead
    LakeTable.rollback(spark, table, 0)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(table, out, chk))
    assert(err.getCause.getMessage.contains("skipChangeCommits"),
      s"rollback must refuse with the opt-out named: ${err.getCause.getMessage}")
  }

  test("a delete commit refuses loudly; skipChangeCommits skips it and follows later appends") {
    val root = "/tmp/graft_tstream_refuse"
    SparkSpec.rmdir(root)
    val table = s"$root/t"
    LakeTable.overwrite(rows(0, 10), table)             // v0
    LakeTable.delete(spark, table, col("id") < 3L)      // v1: rewrite
    LakeTable.append(rows(100, 4), table)               // v2

    val err = intercept[StreamingQueryException] {
      drain(table, s"$root/out1", s"$root/chk1")
    }
    assert(err.getCause.getMessage.contains("skipChangeCommits"),
      s"refusal must name the opt-out: ${err.getCause.getMessage}")

    // opted in: v1 skipped wholesale, v0 + v2 delivered
    val n = drain(table, s"$root/out2", s"$root/chk2",
      Map("skipChangeCommits" -> "true"))
    assert(n === 2)
    val got = spark.read.parquet(s"$root/out2")
    assert(got.count() === 14, "snapshot (10) + append (4), delete never retracted")
  }

  test("lake-to-lake: graftlake source streamed into the graftlake sink, exactly once") {
    val root = "/tmp/graft_tstream_loop"
    SparkSpec.rmdir(root)
    val (src, dst, chk) = (s"$root/src", s"$root/dst", s"$root/chk")
    LakeTable.overwrite(rows(0, 12), src)
    LakeTable.append(rows(12, 8), src)

    def loop(): Unit = {
      val q = spark.readStream.format("graftlake").load(src)
        .writeStream.format("graftlake")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    loop()
    assert(LakeTable.read(spark, dst).count() === 20)
    // re-run with nothing new: the ledger + offsets deliver nothing twice
    loop()
    assert(LakeTable.read(spark, dst).count() === 20)
    LakeTable.append(rows(20, 3), src)
    loop()
    val d = LakeTable.read(spark, dst)
    assert(d.count() === 23)
    assert(d.select(countDistinct("id")).head().getLong(0) === 23)
  }
}
