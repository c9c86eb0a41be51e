package graft

import graft.sources.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** V2 COLUMN statistics (S9i → CBO): after ANALYZE, the graftlake
  * scan reports per-column distinct counts folded from the manifest
  * sketches — post-prune, restricted to the read schema — so
  * Catalyst's cost-based optimizer sees real NDV for join
  * cardinality instead of guessing. */
class ColumnStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.collect { case s: graft.sources.GraftLakeScan => s }

  test("scan reports sketch NDV as V2 column statistics") {
    val p = "/tmp/graft_test/colstats"
    SparkSpec.rmdir(p)
    val df = (0 until 10000).map(i => (i.toLong, (i % 40).toLong, s"t${i % 7}"))
      .toDF("id", "grp", "tag")
    LakeTable.append(df.filter(col("id") % 2 === 0), p)
    LakeTable.append(df.filter(col("id") % 2 =!= 0), p)
    LakeTable.analyzeNdv(spark, p, Seq("id", "grp", "tag"))
    val scan = scanOf(spark.read.format("graftlake").load(p))
    assert(scan.isDefined, "expected a GraftLakeScan in the plan")
    val st = scan.get.estimateStatistics()
    assert(st.numRows().getAsLong == 10000L)
    val cs = st.columnStats()
    def ndv(c: String): Long = {
      val hit = cs.entrySet().iterator()
      var out = -1L
      while (hit.hasNext) {
        val e = hit.next()
        if (e.getKey.fieldNames().mkString(".") == c)
          out = e.getValue.distinctCount().getAsLong
      }
      out
    }
    // grp/tag are in coupon mode → exact; id within HLL error
    assert(ndv("grp") == 40L, s"grp ndv ${ndv("grp")}")
    assert(ndv("tag") == 7L, s"tag ndv ${ndv("tag")}")
    assert(math.abs(ndv("id") - 10000.0) / 10000.0 < 0.05, s"id ndv ${ndv("id")}")
  }

  test("column stats follow pruning and column projection") {
    val p = "/tmp/graft_test/colstats_prune"
    SparkSpec.rmdir(p)
    // two appends with DISJOINT id ranges → file-level prunable
    LakeTable.append((0 until 5000).map(i => (i.toLong, s"t${i % 7}"))
      .toDF("id", "tag"), p)
    LakeTable.append((5000 until 10000).map(i => (i.toLong, s"u${i % 13}"))
      .toDF("id", "tag"), p)
    LakeTable.analyzeNdv(spark, p, Seq("id", "tag"))
    // prune to the first file: the reported NDV is the SURVIVORS'
    val pruned = scanOf(spark.read.format("graftlake").load(p)
      .filter(col("id") >= 0L && col("id") <= 4999L))
    assert(pruned.isDefined)
    val cs = pruned.get.estimateStatistics()
    assert(cs.numRows().getAsLong == 5000L, "prune must drop the second file")
    val tagNdv = {
      val it = cs.columnStats().entrySet().iterator()
      var out = -1L
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.fieldNames().mkString(".") == "tag")
          out = e.getValue.distinctCount().getAsLong
      }
      out
    }
    assert(tagNdv == 7L, s"post-prune tag ndv must be the survivor's 7, got $tagNdv")
    // projection: a scan that never reads `tag` must not report it
    val projected = scanOf(spark.read.format("graftlake").load(p).select("id"))
    assert(projected.isDefined)
    val keys = {
      val it = projected.get.estimateStatistics().columnStats().keySet().iterator()
      var out = List.empty[String]
      while (it.hasNext) out = it.next().fieldNames().mkString(".") :: out
      out.toSet
    }
    assert(keys == Set("id"), s"pruned-away columns must not dangle: $keys")
  }

  test("CBO consumes the reported NDV in logical-plan stats") {
    val p = "/tmp/graft_test/colstats_cbo"
    SparkSpec.rmdir(p)
    LakeTable.append((0 until 2000).map(i => ((i % 25).toLong, i.toLong))
      .toDF("grp", "v"), p)
    LakeTable.analyzeNdv(spark, p, Seq("grp"))
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.read.format("graftlake").load(p)
      val stats = df.queryExecution.optimizedPlan.stats
      val ndv = stats.attributeStats.toSeq.collectFirst {
        case (a, s) if a.name == "grp" => s.distinctCount
      }.flatten
      assert(ndv.contains(BigInt(25)), s"CBO attributeStats must carry grp=25: $ndv")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }
}
