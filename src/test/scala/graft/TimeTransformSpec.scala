package graft

import graft.sources.LakeTable
import graft.sources.LakeTable.PartitionTransform
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** hour/month/year hidden-partition transforms (the rest of Iceberg's
  * time-transform family next to `day`): write-side calendar indices,
  * read-side pruning across calendar boundaries, DDL routing, and
  * month-keyed storage-partitioned joins. */
class TimeTransformSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("write-side month/year/hour indices agree with the driver calendar") {
    // sweep includes pre-1970 (negative floor-div), leap day 2020-02-29,
    // and month/year boundaries one second either side
    val epochs = Seq(
      -86400L * 400 - 7, -1L, 0L, 1L,
      1582934400L - 1, 1582934400L, // 2020-02-29 00:00:00 UTC
      1577836800L - 1, 1577836800L, // 2020-01-01 00:00:00 UTC
      1700000000L, 4102444800L)     // 2100-01-01
    val df = epochs.toDF("ts_s")
    val got = df.select(
      col("ts_s"),
      LakeTable.partitionValueExpr(PartitionTransform("ts_s", "month")).as("m"),
      LakeTable.partitionValueExpr(PartitionTransform("ts_s", "year")).as("y"),
      LakeTable.partitionValueExpr(PartitionTransform("ts_s", "hour")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (sec, m, y, h) =>
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(sec, 86400L))
      assert(m == (d.getYear - 1970).toLong * 12 + d.getMonthValue - 1,
        s"month index of $sec")
      assert(y == (d.getYear - 1970).toLong, s"year index of $sec")
      assert(h == Math.floorDiv(sec, 3600L), s"hour index of $sec")
    }
  }

  test("months() DDL: inserts land under the layout and month predicates prune") {
    val root = "/tmp/graft_test/timet_month"
    SparkSpec.rmdir(root)
    spark.conf.set("spark.sql.catalog.ttm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ttm.warehouse", root)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS ttm.db")
      spark.sql(
        """CREATE TABLE ttm.db.ev (id BIGINT, ts_s BIGINT, v DOUBLE)
          |USING graftlake PARTITIONED BY (months(ts_s))""".stripMargin)
      // ~6 months of ids, Jan..Jun 2020 (covers the leap month)
      spark.sql(
        """INSERT INTO ttm.db.ev
          |SELECT id, 1577836800 + id * 43200, id * 1.5
          |FROM range(0, 360)""".stripMargin)
      val p = s"$root/db/ev"
      // a window inside March 2020 must open only March's files
      val lo = 1583020800d // 2020-03-01
      val hi = 1585699199d // 2020-03-31 23:59:59
      val out = LakeTable.readWhere(spark, p, Seq(("ts_s", lo, hi)))
      val expected = (0 until 360)
        .map(i => (i.toLong, 1577836800L + i * 43200L, i * 1.5))
        .filter(t => t._2 >= lo && t._2 <= hi)
      assert(out.select("id", "ts_s", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        == expected.toSet)
      val audit = LakeTable.auditOf(p)
      assert(audit.filesKept < audit.filesClaimed,
        s"month layout must prune non-March files: $audit")
    } finally {
      spark.conf.unset("spark.sql.catalog.ttm")
      spark.conf.unset("spark.sql.catalog.ttm.warehouse")
    }
  }

  test("month-partitioned catalog tables join shuffle-free via the month function") {
    val root = "/tmp/graft_test/timet_spj"
    SparkSpec.rmdir(root)
    spark.conf.set("spark.sql.catalog.ttspj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ttspj.warehouse", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS ttspj.db")
      val spec = Seq(PartitionTransform("ts_s", "month"))
      val left = (0 until 3000)
        .map(i => (1577836800L + (i % 500) * 40000L, i * 3.0)).toDF("ts_s", "x")
      val right = (0 until 250)
        .map(i => (1577836800L + i * 80000L, s"r_$i")).toDF("ts_s", "tag")
      LakeTable.overwriteHiddenPartitioned(left, s"$root/db/l", spec)
      LakeTable.overwriteHiddenPartitioned(right, s"$root/db/r", spec)
      val j = spark.sql(
        """SELECT /*+ MERGE(l) */ l.ts_s, x, tag
          |FROM ttspj.db.l l JOIN ttspj.db.r r ON l.ts_s = r.ts_s
          |ORDER BY l.ts_s, x, tag""".stripMargin)
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"month SPJ must not hash-shuffle either side:\n$plan")
      val expected = left.join(right, "ts_s").orderBy("ts_s", "x", "tag")
        .select("ts_s", "x", "tag").collect()
      assert(rows.toSeq === expected.toSeq)
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.unset("spark.sql.catalog.ttspj")
      spark.conf.unset("spark.sql.catalog.ttspj.warehouse")
    }
  }

  test("hour layout prunes an hour window") {
    val p = "/tmp/graft_test/timet_hour"
    SparkSpec.rmdir(p)
    val spec = Seq(PartitionTransform("ts_s", "hour"))
    val df = (0 until 240)
      .map(i => (i.toLong, 1700000000L + i * 300L)).toDF("id", "ts_s")
    LakeTable.overwriteHiddenPartitioned(df, p, spec)
    val lo = 1700003600d
    val hi = 1700007199d
    val out = LakeTable.readWhere(spark, p, Seq(("ts_s", lo, hi)))
    val expected = (0 until 240).map(i => 1700000000L + i * 300L)
      .filter(t => t >= lo && t <= hi)
    assert(out.select("ts_s").collect().map(_.getLong(0)).sorted.toSeq
      == expected.sorted)
    val audit = LakeTable.auditOf(p)
    assert(audit.filesKept < audit.filesClaimed,
      s"hour layout must prune outside the window: $audit")
  }
}
