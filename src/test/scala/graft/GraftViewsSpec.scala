package graft

import graft.sources.{GraftViews, LakeTable}
import org.scalatest.funsuite.AnyFunSuite

/** VERSIONED VIEWS (S11g) through Spark's native ViewCatalog route:
  * CREATE/REPLACE/ALTER/DROP/SHOW VIEWS and SELECT-through-view all
  * resolve against [[graft.sources.GraftCatalog]], and every mutation
  * commits a NEW immutable version file — `v.versions` reads the
  * audit trail, so a REPLACE never destroys the prior definition. */
class GraftViewsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s
  }
  private val wh = "/tmp/graft_test/views_wh"
  import SparkSpec.rmdir

  private def sql(q: String) = spark.sql(q)

  test("view lifecycle: CREATE, SELECT through, REPLACE versions, DROP") {
    rmdir(s"$wh/vdb")
    sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb")
    sql("CREATE TABLE graft.vdb.t (k BIGINT, v DOUBLE) USING graftlake")
    sql("INSERT INTO graft.vdb.t SELECT id, id * 2.0 FROM range(0, 10)")
    sql("CREATE VIEW graft.vdb.doubles AS SELECT k, v FROM graft.vdb.t WHERE k >= 5")
    assert(sql("SELECT count(*) AS n FROM graft.vdb.doubles").head.getLong(0) === 5L)
    // the view tracks the TABLE's evolution (a view is a query, not a copy)
    sql("INSERT INTO graft.vdb.t SELECT id, id * 2.0 FROM range(10, 20)")
    assert(sql("SELECT count(*) AS n FROM graft.vdb.doubles").head.getLong(0) === 15L)
    // REPLACE commits version 1; the definition changes in place…
    sql("CREATE OR REPLACE VIEW graft.vdb.doubles AS " +
      "SELECT k, v FROM graft.vdb.t WHERE k < 5")
    assert(sql("SELECT count(*) AS n FROM graft.vdb.doubles").head.getLong(0) === 5L)
    // …and the HISTORY keeps both: versions 0 and 1, old SQL intact
    val hist = sql("SELECT version, sql FROM graft.vdb.doubles.versions ORDER BY version")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(hist.map(_._1).toSeq === Seq(0, 1))
    assert(hist(0)._2.contains("k >= 5") && hist(1)._2.contains("k < 5"),
      s"history must keep the replaced definition: ${hist.toSeq}")
    // VERSION AS OF replays THAT VERSION'S DEFINITION over current
    // data: v0 (k >= 5) over the 20-row table = 15, even though the
    // current definition (v1, k < 5) answers 5
    assert(sql("SELECT count(*) AS n FROM graft.vdb.doubles VERSION AS OF 0")
      .head.getLong(0) === 15L)
    assert(sql("SELECT count(*) AS n FROM graft.vdb.doubles VERSION AS OF 1")
      .head.getLong(0) === 5L)
    val eTt = intercept[Exception](
      sql("SELECT * FROM graft.vdb.doubles TIMESTAMP AS OF current_timestamp()")
        .collect())
    assert(eTt.getMessage.contains("VERSION AS OF"), eTt.getMessage)
    val eNoV = intercept[Exception](
      sql("SELECT * FROM graft.vdb.doubles VERSION AS OF 9").collect())
    assert(eNoV.getMessage.contains("versions"), eNoV.getMessage)
    // SHOW VIEWS lists it; tables and views stay distinct
    assert(sql("SHOW VIEWS IN graft.vdb").collect().map(_.getString(1))
      .contains("doubles"))
    assert(!sql("SHOW TABLES IN graft.vdb").collect().map(_.getString(1))
      .contains("doubles"))
    sql("DROP VIEW graft.vdb.doubles")
    intercept[Exception](sql("SELECT * FROM graft.vdb.doubles").collect())
    sql("DROP TABLE graft.vdb.t")
  }

  test("stored resolution context: the view works from another namespace") {
    rmdir(s"$wh/vctx")
    sql("CREATE NAMESPACE IF NOT EXISTS graft.vctx")
    sql("CREATE TABLE graft.vctx.src (k BIGINT) USING graftlake")
    sql("INSERT INTO graft.vctx.src SELECT id FROM range(0, 7)")
    // body references the table by BARE name — resolvable only
    // through the stored (catalog, namespace) context
    sql("USE graft.vctx")
    try sql("CREATE VIEW graft.vctx.ctx_view AS SELECT k FROM src WHERE k > 2")
    finally sql("USE spark_catalog.default")
    // reading from a completely different context still resolves
    assert(sql("SELECT count(*) AS n FROM graft.vctx.ctx_view").head.getLong(0) === 4L)
  }

  test("ALTER VIEW properties commit versions; rename moves the definition") {
    rmdir(s"$wh/valt")
    sql("CREATE NAMESPACE IF NOT EXISTS graft.valt")
    sql("CREATE TABLE graft.valt.t (k BIGINT) USING graftlake")
    sql("INSERT INTO graft.valt.t SELECT id FROM range(0, 3)")
    sql("CREATE VIEW graft.valt.v1 AS SELECT k FROM graft.valt.t")
    sql("ALTER VIEW graft.valt.v1 SET TBLPROPERTIES ('owner.team' = 'data')")
    assert(GraftViews.versions(s"$wh/valt/v1") === Seq(0, 1),
      "a property change is an audited version, not an in-place edit")
    assert(GraftViews.load(s"$wh/valt/v1", 1).properties
      .get("owner.team").contains("data"))
    sql("ALTER VIEW graft.valt.v1 UNSET TBLPROPERTIES ('owner.team')")
    assert(!GraftViews.load(s"$wh/valt/v1", 2).properties.contains("owner.team"))
    // rename: views move freely (the body resolves through the stored
    // context, never through the view's own path)
    sql("ALTER VIEW graft.valt.v1 RENAME TO graft.valt.v2")
    assert(sql("SELECT count(*) AS n FROM graft.valt.v2").head.getLong(0) === 3L)
    assert(GraftViews.versions(s"$wh/valt/v2").size === 3)
    assert(!GraftViews.isView(s"$wh/valt/v1"))
  }

  test("materialized view: fresh reads serve STORAGE; staleness falls back; REFRESH re-arms") {
    rmdir(s"$wh/mv")
    sql("CREATE NAMESPACE IF NOT EXISTS graft.mv")
    sql("CREATE TABLE graft.mv.src (k BIGINT, g STRING) USING graftlake")
    sql("INSERT INTO graft.mv.src SELECT id, concat('g', id % 3) FROM range(0, 30)")
    sql("CREATE MATERIALIZED VIEW graft.mv.agg AS " +
      "SELECT g, count(*) AS n FROM graft.mv.src GROUP BY g")
    val storage = s"$wh/mv/agg/_graft_mv_storage"
    // FRESH: the read lists ONLY storage files — never the source
    val fresh = sql("SELECT g, n FROM graft.mv.agg ORDER BY g")
    assert(fresh.inputFiles.forall(_.contains("_graft_mv_storage")),
      s"a fresh materialized read must serve storage: ${fresh.inputFiles.toSeq}")
    assert(fresh.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("g0", 10L), ("g1", 10L), ("g2", 10L)))
    // STALE: a source commit flips the read to the query expansion —
    // correct CURRENT answers, the source relation back in the plan
    // (the V2 source contributes no inputFiles, so the plan is the
    // observation surface here)
    sql("INSERT INTO graft.mv.src SELECT id, 'g0' FROM range(100, 105)")
    val stale = sql("SELECT g, n FROM graft.mv.agg ORDER BY g")
    val stalePlan = stale.queryExecution.analyzed.toString
    assert(!stalePlan.contains("_graft_mv_storage") &&
      stalePlan.contains("graft.mv.src"),
      s"a stale materialized view must recompute through the query: $stalePlan")
    assert(stale.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("g0", 15L), ("g1", 10L), ("g2", 10L)),
      "stale reads must still answer CURRENT data (never stale storage)")
    // REFRESH re-arms storage (a new view version audits it) and the
    // storage table itself time-travels over refresh generations
    sql("REFRESH MATERIALIZED VIEW graft.mv.agg")
    val post = sql("SELECT g, n FROM graft.mv.agg ORDER BY g")
    assert(post.inputFiles.forall(_.contains("_graft_mv_storage")))
    assert(post.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("g0", 15L), ("g1", 10L), ("g2", 10L)))
    // CREATE committed v0 (definition) + v1 (initial refresh); the
    // explicit REFRESH is v2 — every refresh is an audited version
    assert(GraftViews.versions(s"$wh/mv/agg").size === 3,
      "the refresh must commit an audited view version")
    assert(LakeTable.read(spark, storage, Some(0))
      .collect().map(_.getLong(1)).sum === 30L,
      "storage v0 keeps the pre-refresh result (time travel over refreshes)")
    // refreshing a fresh view is a no-op version-wise
    sql("REFRESH MATERIALIZED VIEW graft.mv.agg")
    assert(GraftViews.versions(s"$wh/mv/agg").size === 3)
    // the CALL procedure route drives the same refresh machinery:
    // fresh → false; stale after another source commit → true
    assert(!sql("CALL graft.system.refresh_materialized_view('mv.agg')")
      .head.getBoolean(0), "refresh of a fresh view reports false")
    sql("INSERT INTO graft.mv.src SELECT id, 'g1' FROM range(200, 202)")
    assert(sql("CALL graft.system.refresh_materialized_view('mv.agg')")
      .head.getBoolean(0), "refresh of a stale view reports true")
    assert(sql("SELECT n FROM graft.mv.agg WHERE g = 'g1'").head.getLong(0) === 12L)
    assert(GraftViews.versions(s"$wh/mv/agg").size === 4)
  }

  test("materialized view refuses untrackable sources by name") {
    rmdir(s"$wh/mvref")
    sql("CREATE NAMESPACE IF NOT EXISTS graft.mvref")
    spark.range(5).toDF("k").createOrReplaceTempView("mv_tmp_src")
    val e = intercept[Exception](
      sql("CREATE MATERIALIZED VIEW graft.mvref.bad AS SELECT k FROM mv_tmp_src"))
    assert(e.getMessage.contains("version-trackable"), e.getMessage)
  }

  test("views and tables refuse to shadow each other") {
    rmdir(s"$wh/vclash")
    sql("CREATE NAMESPACE IF NOT EXISTS graft.vclash")
    sql("CREATE TABLE graft.vclash.t (k BIGINT) USING graftlake")
    val e1 = intercept[Exception](
      sql("CREATE VIEW graft.vclash.t AS SELECT 1 AS x"))
    assert(e1.getMessage.toLowerCase.contains("table"))
    sql("CREATE VIEW graft.vclash.v AS SELECT 1 AS x")
    val e2 = intercept[Exception](
      sql("CREATE TABLE graft.vclash.v (k BIGINT) USING graftlake"))
    assert(e2.getMessage.toLowerCase.contains("view"))
    // CREATE VIEW (no REPLACE) on an existing view refuses too
    intercept[Exception](sql("CREATE VIEW graft.vclash.v AS SELECT 2 AS x"))
  }
}
