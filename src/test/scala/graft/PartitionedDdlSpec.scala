package graft

import graft.sources.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S9g — `PARTITIONED BY` through DDL: CREATE TABLE declares a
  * standing hidden-partition spec; every INSERT lands under it with
  * the writer never naming the layout, and source-column predicates
  * prune through it. */
class PartitionedDdlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s
  }
  private val wh = "/tmp/graft_test/part_ddl_wh"
  import SparkSpec.rmdir

  test("CREATE TABLE PARTITIONED BY (bucket, days): inserts land under the layout, predicates prune") {
    rmdir(s"$wh/pd")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pd")
    spark.sql("DROP TABLE IF EXISTS graft.pd.ev")
    spark.sql(
      """CREATE TABLE graft.pd.ev (event_id BIGINT, user_id BIGINT, ts_s BIGINT, value DOUBLE)
        |USING graftlake PARTITIONED BY (bucket(4, user_id), days(ts_s))""".stripMargin)
    spark.sql(
      """INSERT INTO graft.pd.ev
        |SELECT id, id % 8, 86400 * (id % 3), id * 1.5 FROM range(0, 400)""".stripMargin)
    val p = s"$wh/pd/ev"
    // the declared spec was applied without the writer naming it:
    // files live under hidden __p_ layout dirs
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$p/data"))
    val files = try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    } finally walk.close()
    // the CREATE-time empty sentinel may leave one zero-row plain
    // file; every DATA-carrying write lands under the layout
    val (layout, plain) = files.partition(_.contains("/__p_"))
    assert(layout.nonEmpty && layout.forall(f =>
      f.matches(".*__p_bucket4_user_id=\\d.*") &&
        f.matches(".*__p_day_ts_s=\\d.*")), layout.take(3))
    assert(plain.size <= 1, plain)
    // full content correct through the catalog
    assert(spark.sql("SELECT count(*) FROM graft.pd.ev").head.getLong(0) === 400L)
    // source-column predicates prune files through the hidden layout
    val pruned = LakeTable.readWhere(spark, p,
      Seq(("user_id", 3.0, 3.0), ("ts_s", 0.0, 86399.0)))
    val got = pruned.agg(count(lit(1))).head.getLong(0)
    val expect = spark.sql(
      "SELECT count(*) FROM graft.pd.ev WHERE user_id = 3 AND ts_s < 86400")
      .head.getLong(0)
    assert(got === expect && got > 0)
    val audit = LakeTable.auditOf(p)
    assert(audit.filesKept < audit.filesClaimed,
      s"layout pruning must skip files: $audit")
    // the spec is STANDING: a second insert keeps the layout
    spark.sql("INSERT INTO graft.pd.ev VALUES (1000, 5, 172800, 9.0)")
    assert(spark.sql("SELECT count(*) FROM graft.pd.ev").head.getLong(0) === 401L)
    spark.sql("DROP TABLE graft.pd.ev")
  }

  test("CTAS PARTITIONED BY adopts the layout atomically; unsupported transforms refuse") {
    rmdir(s"$wh/pd2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pd2")
    spark.sql("DROP TABLE IF EXISTS graft.pd2.c")
    spark.sql(
      """CREATE TABLE graft.pd2.c USING graftlake PARTITIONED BY (identity(k))
        |AS SELECT id % 3 AS k, id AS v FROM range(0, 30)""".stripMargin)
    val p = s"$wh/pd2/c"
    assert(LakeTable.partitionSpecOf(p).map(t => (t.source, t.kind)) ===
      Seq(("k", "identity")))
    assert(spark.sql("SELECT count(*) FROM graft.pd2.c WHERE k = 1").head.getLong(0) === 10L)
    // standing: further inserts route through the layout
    spark.sql("INSERT INTO graft.pd2.c VALUES (1, 100)")
    assert(spark.sql("SELECT count(*) FROM graft.pd2.c WHERE k = 1").head.getLong(0) === 11L)
    // unsupported transform shapes refuse at CREATE, nothing half-made:
    // time transforms exist (TimeTransformSpec) but only over the
    // epoch-second integral convention, never raw TIMESTAMP columns
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE graft.pd2.bad (k BIGINT, ts TIMESTAMP) USING graftlake " +
        "PARTITIONED BY (hours(ts))")
    }
    assert(ex.getMessage.contains("epoch-second"), ex.getMessage)
    assert(!spark.catalog.tableExists("graft.pd2.bad"))
    // shapes the WRITE path would reject must refuse at CREATE too —
    // otherwise the table is born unwritable (half-made)
    val zero = intercept[Exception] {
      spark.sql("CREATE TABLE graft.pd2.bad2 (k BIGINT) USING graftlake " +
        "PARTITIONED BY (bucket(0, k))")
    }
    assert(zero.getMessage.contains("positive width"), zero.getMessage)
    val narrow = intercept[Exception] {
      spark.sql("CREATE TABLE graft.pd2.bad3 (k INT) USING graftlake " +
        "PARTITIONED BY (bucket(4, k))")
    }
    assert(narrow.getMessage.contains("BIGINT"), narrow.getMessage)
    assert(!spark.catalog.tableExists("graft.pd2.bad2") &&
      !spark.catalog.tableExists("graft.pd2.bad3"))
    spark.sql("DROP TABLE graft.pd2.c")
  }
}
