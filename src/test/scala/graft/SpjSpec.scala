package graft

import graft.sources.LakeTable
import graft.sources.LakeTable.PartitionTransform
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins over the V2 connector: two lake tables
  * co-partitioned by a hidden transform join with ZERO shuffle
  * exchanges under `spark.sql.sources.v2.bucketing.enabled` — the
  * Iceberg SPJ shape. Results are always asserted against the plain
  * (shuffled) join, so the keyed path is correctness-gated, not just
  * plan-gated. */
class SpjSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def withSpj[T](body: => T): T = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    try body
    finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  private def exchanges(df: DataFrame): Int =
    "Exchange ".r.findAllIn(df.queryExecution.executedPlan.toString).length

  private def facts(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong % 40, i.toLong, i * 2.5)).toDF("k", "seq", "v")
  private def dims(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong % 40, s"d_$i", i * 1.0)).toDF("k", "name", "w")

  test("identity-partitioned tables join with zero shuffles (path-based SPJ)") {
    val root = "/tmp/graft_spj_identity"
    SparkSpec.rmdir(root)
    val (ta, tb) = (s"$root/a", s"$root/b")
    val spec = Seq(PartitionTransform("k", "identity"))
    LakeTable.overwriteHiddenPartitioned(facts(4000), ta, spec)
    LakeTable.appendHiddenPartitioned(facts(1000), ta, spec) // second generation, same spec
    LakeTable.overwriteHiddenPartitioned(dims(400), tb, spec)

    def read(p: String) = spark.read.format("graftlake").load(p)
    val joined = withSpj {
      val j = read(ta).join(read(tb), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), round(sum($"v" * $"w"), 6).as("s"))
        .orderBy("k")
      // one exchange is allowed for the final orderBy; the JOIN and
      // the groupBy must ride the storage partitioning
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"SPJ join must not hash-shuffle either side:\n$plan")
      j.collect()
    }
    val expected = facts(4000).unionAll(facts(1000)).join(dims(400), "k")
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum($"v" * $"w"), 6).as("s"))
      .orderBy("k").collect()
    assert(joined.toSeq === expected.toSeq)
  }

  test("bucket-partitioned catalog tables join shuffle-free via the bucket function") {
    val root = "/tmp/graft_spj_bucket"
    SparkSpec.rmdir(root)
    spark.conf.set("spark.sql.catalog.spjcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjcat.warehouse", root)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS spjcat.db")
      val spec = Seq(PartitionTransform("id", "bucket", 8))
      val left = (0 until 5000).map(i => (i.toLong, i * 3.0)).toDF("id", "x")
      val right = (0 until 1000).map(i => (i.toLong * 5, s"r_$i")).toDF("id", "tag")
      LakeTable.overwriteHiddenPartitioned(left, s"$root/db/l", spec)
      LakeTable.overwriteHiddenPartitioned(right, s"$root/db/r", spec)

      val (rows, plan) = withSpj {
        // disable broadcast so the join would otherwise shuffle both sides
        val j = spark.sql(
          """SELECT /*+ MERGE(l) */ l.id, x, tag
            |FROM spjcat.db.l l JOIN spjcat.db.r r ON l.id = r.id
            |ORDER BY l.id""".stripMargin)
        (j.collect(), j.queryExecution.executedPlan.toString)
      }
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket SPJ must not hash-shuffle either side:\n$plan")
      val expected = left.join(right, "id").orderBy("id")
        .select("id", "x", "tag").collect()
      assert(rows.toSeq === expected.toSeq)
    } finally {
      spark.conf.unset("spark.sql.catalog.spjcat")
      spark.conf.unset("spark.sql.catalog.spjcat.warehouse")
    }
  }

  test("day-partitioned catalog tables join shuffle-free via the day function") {
    val root = "/tmp/graft_spj_day"
    SparkSpec.rmdir(root)
    spark.conf.set("spark.sql.catalog.spjday", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjday.warehouse", root)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS spjday.db")
      val spec = Seq(PartitionTransform("ts_s", "day"))
      // epoch-seconds spanning ~10 days; join key IS the timestamp, a
      // function of which (day) is the partition — equal keys provably
      // co-locate, the Iceberg SPJ-over-transforms shape
      val left = (0 until 5000)
        .map(i => (1700000000L + (i % 800) * 1000L, i * 3.0)).toDF("ts_s", "x")
      val right = (0 until 400)
        .map(i => (1700000000L + i * 2000L, s"r_$i")).toDF("ts_s", "tag")
      LakeTable.overwriteHiddenPartitioned(left, s"$root/db/l", spec)
      LakeTable.overwriteHiddenPartitioned(right, s"$root/db/r", spec)

      val (rows, plan) = withSpj {
        val j = spark.sql(
          """SELECT /*+ MERGE(l) */ l.ts_s, x, tag
            |FROM spjday.db.l l JOIN spjday.db.r r ON l.ts_s = r.ts_s
            |ORDER BY l.ts_s, x, tag""".stripMargin)
        (j.collect(), j.queryExecution.executedPlan.toString)
      }
      assert(!plan.contains("Exchange hashpartitioning"),
        s"day SPJ must not hash-shuffle either side:\n$plan")
      val expected = left.join(right, "ts_s").orderBy("ts_s", "x", "tag")
        .select("ts_s", "x", "tag").collect()
      assert(rows.toSeq === expected.toSeq)
    } finally {
      spark.conf.unset("spark.sql.catalog.spjday")
      spark.conf.unset("spark.sql.catalog.spjday.warehouse")
    }
  }

  test("truncate-partitioned tables fall back to shuffle (engine gate) but stay correct") {
    val root = "/tmp/graft_spj_trunc"
    SparkSpec.rmdir(root)
    spark.conf.set("spark.sql.catalog.spjtr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjtr.warehouse", root)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS spjtr.db")
      val spec = Seq(PartitionTransform("id", "truncate", 100))
      val left = (0 until 4000).map(i => (i.toLong, i * 2.0)).toDF("id", "x")
      val right = (0 until 800).map(i => (i.toLong * 5, s"t_$i")).toDF("id", "tag")
      LakeTable.overwriteHiddenPartitioned(left, s"$root/db/l", spec)
      LakeTable.overwriteHiddenPartitioned(right, s"$root/db/r", spec)

      // Spark's KeyGroupedPartitioning requires single-leaf partition
      // expressions (only bucket's literal width is special-cased into
      // numBucketsOpt), so truncate(width, col) can never satisfy the
      // join's clustered distribution — the layout correctly reports
      // Unknown and the join shuffles, with identical results
      val (rows, plan) = withSpj {
        val j = spark.sql(
          """SELECT /*+ MERGE(l) */ l.id, x, tag
            |FROM spjtr.db.l l JOIN spjtr.db.r r ON l.id = r.id
            |ORDER BY l.id""".stripMargin)
        (j.collect(), j.queryExecution.executedPlan.toString)
      }
      assert(plan.contains("Exchange hashpartitioning"),
        s"truncate layouts are documented non-keyable on this Spark:\n$plan")
      val expected = left.join(right, "id").orderBy("id")
        .select("id", "x", "tag").collect()
      assert(rows.toSeq === expected.toSeq)
    } finally {
      spark.conf.unset("spark.sql.catalog.spjtr")
      spark.conf.unset("spark.sql.catalog.spjtr.warehouse")
    }
  }

  test("mixed-spec generations fall back to Unknown partitioning but stay correct") {
    val root = "/tmp/graft_spj_mixed"
    SparkSpec.rmdir(root)
    val t = s"$root/t"
    LakeTable.overwriteHiddenPartitioned(
      facts(500), t, Seq(PartitionTransform("k", "identity")))
    LakeTable.appendHiddenPartitioned(
      facts(500), t, Seq(PartitionTransform("k", "bucket", 4))) // spec evolved
    withSpj {
      val got = spark.read.format("graftlake").load(t)
        .groupBy("k").count().orderBy("k").collect()
      assert(got.length === 40)
      assert(got.map(_.getLong(1)).sum === 1000L)
    }
  }

  test("partially-clustered SPJ: skewed key keeps its splits, zero hash exchanges") {
    // Iceberg's partially-clustered mode (S9c): the hot partition
    // value of a skewed fact side must NOT serialize into one task —
    // under Spark's partiallyClusteredDistribution flag the connector
    // reports split-granular keyed partitions, Spark replicates the
    // dim side's matching partition across the hot key's splits, and
    // the join still plans with zero hash exchanges.
    val root = "/tmp/graft_spj_skew"
    SparkSpec.rmdir(root)
    val (ta, tb) = (s"$root/a", s"$root/b")
    val spec = Seq(PartitionTransform("k", "identity"))
    def skewed(offset: Int): DataFrame =
      // key 7 dominates; keys 0-4 tiny
      ((0 until 2000).map(i => (7L, offset + i.toLong, i * 1.5)) ++
        (0 until 50).map(i => (i.toLong % 5, offset + 10000L + i, i * 0.5)))
        .toDF("k", "seq", "v")
    // three appends → three files per partition value present in each
    LakeTable.overwriteHiddenPartitioned(skewed(0), ta, spec)
    LakeTable.appendHiddenPartitioned(skewed(100000), ta, spec)
    LakeTable.appendHiddenPartitioned(skewed(200000), ta, spec)
    LakeTable.overwriteHiddenPartitioned(
      (0 until 8).map(i => (i.toLong, s"d_$i")).toDF("k", "name"), tb, spec)

    def read(p: String) = spark.read.format("graftlake").load(p)
    def runJoin(): (Array[org.apache.spark.sql.Row], String, Int) = {
      val j = read(ta).join(read(tb), "k")
        .select($"k", $"seq", $"v", $"name")
      val rows = j.orderBy("k", "seq").collect()
      val plan = j.queryExecution.executedPlan.toString
      val parts = j.rdd.getNumPartitions
      (rows, plan, parts)
    }
    val (groupedRows, groupedPlan, groupedParts) = withSpj {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try runJoin()
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    assert(!groupedPlan.contains("Exchange hashpartitioning"),
      s"plain SPJ must not hash-shuffle:\n$groupedPlan")
    assert(groupedParts === 8, // pushPartValues: union of both sides' keys (0..7)
      s"grouped SPJ runs one task per key, got $groupedParts")
    val (pcRows, pcPlan, pcParts) = withSpj {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
      try runJoin()
      finally {
        spark.conf.unset(
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    assert(!pcPlan.contains("Exchange hashpartitioning"),
      s"partially-clustered SPJ must not hash-shuffle:\n$pcPlan")
    assert(pcParts > groupedParts,
      s"the skewed key's splits must exceed the one-task-per-key count: " +
        s"$pcParts vs $groupedParts")
    assert(pcRows.toSeq === groupedRows.toSeq,
      "partially-clustered replication must not change the join result")
    // value-level gate against the plain (shuffled) join
    val expected = (skewed(0).unionAll(skewed(100000)).unionAll(skewed(200000)))
      .join((0 until 8).map(i => (i.toLong, s"d_$i")).toDF("k", "name"), "k")
      .select($"k", $"seq", $"v", $"name").orderBy("k", "seq").collect()
    assert(pcRows.toSeq === expected.toSeq)
  }

  test("SPJ gate off: same tables, plan shuffles, same answer") {
    val root = "/tmp/graft_spj_identity" // reuse tables from the first test
    val ta = s"$root/a"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(ta)))
    val df = spark.read.format("graftlake").load(ta)
      .groupBy("k").agg(sum("v").as("sv")).orderBy("k")
    assert(exchanges(df) >= 1, "without the SPJ gate the aggregate shuffles")
    assert(df.count() === 40)
  }
}
