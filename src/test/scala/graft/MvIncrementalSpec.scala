package graft

import graft.sources.{GraftViews, LakeTable}
import org.scalatest.funsuite.AnyFunSuite

/** INCREMENTAL materialized-view refresh: when the body is one direct
  * lake table under distributive aggregates (sum/count/min/max) and
  * the source moved by PURE APPENDS, REFRESH folds the delta's
  * partial aggregate into the stored result — O(delta + |result|) —
  * and records mode=incremental on the committed view version.
  * Everything outside that contract (DML in range, non-distributive
  * or post-wrapped aggregates, self-joins, hidden group keys) must
  * fall back to the always-correct full recompute, also by recorded
  * mode. Either path's answer must equal the direct recompute. */
class MvIncrementalSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    s.conf.set("spark.sql.catalog.gmvi", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.gmvi.warehouse", wh)
    s
  }
  private val wh = "/tmp/graft_test/mvi_wh"
  import SparkSpec.rmdir

  private def sql(q: String) = spark.sql(q)

  /** mode recorded on the LATEST view version (null when never
    * refreshed); read through the same props the engine writes. */
  private def modeOf(ns: String, v: String): String = {
    val p = s"$wh/$ns/$v"
    GraftViews.load(p, GraftViews.latest(p).get)
      .properties.getOrElse("graft.mv.refreshMode", null)
  }

  private def setup(ns: String): Unit = {
    rmdir(s"$wh/$ns")
    sql(s"CREATE NAMESPACE IF NOT EXISTS gmvi.$ns")
    sql(s"CREATE TABLE gmvi.$ns.t (k STRING, a BIGINT, x DOUBLE) USING graftlake")
    // null group key + null aggregate inputs from the start: the fold
    // must merge the null-keyed group and null-skipping sums exactly
    sql(s"INSERT INTO gmvi.$ns.t VALUES " +
      "('g1', 1, 1.5), ('g1', 2, NULL), ('g2', 10, 4.0), (NULL, 5, 2.0)")
  }

  private def expectEqual(ns: String, mv: String, body: String): Unit = {
    val got = sql(s"SELECT * FROM gmvi.$ns.$mv").collect().toSet
    val want = sql(body).collect().toSet
    assert(got === want, s"MV answer must equal the direct recompute\n" +
      s"got:  ${got.toSeq}\nwant: ${want.toSeq}")
  }

  test("pure append refreshes incrementally; fold equals full recompute") {
    setup("inc")
    val body = "SELECT k, count(*) AS n, sum(a) AS sa, sum(x) AS sx, " +
      "min(a) AS mn, max(a) AS mx FROM gmvi.inc.t GROUP BY k"
    sql(s"CREATE MATERIALIZED VIEW gmvi.inc.m AS $body")
    assert(modeOf("inc", "m") === "full", "initial refresh is full")
    // appended delta: an existing group grows, a NEW group appears,
    // the null-keyed group grows, a null sum input arrives
    sql("INSERT INTO gmvi.inc.t VALUES " +
      "('g1', 7, 0.5), ('g3', 100, NULL), (NULL, -1, 1.0)")
    val r = sql("CALL gmvi.system.refresh_materialized_view('inc.m')").head
    assert(r.getBoolean(0) && r.getString(1) === "incremental",
      s"pure-append refresh must fold incrementally, got $r")
    assert(modeOf("inc", "m") === "incremental")
    expectEqual("inc", "m", body)
    // storage refresh history time-travels: one commit per refresh
    val stor = s"$wh/inc/m/_graft_mv_storage"
    assert(LakeTable.latestVersion(stor).contains(1),
      "initial refresh = v0, incremental refresh = v1")
    assert(LakeTable.read(spark, stor, Some(0)).count() === 3L,
      "v0 keeps the pre-append result")
    // a second append folds on top of the folded state
    sql("INSERT INTO gmvi.inc.t VALUES ('g3', 1, 3.0)")
    sql("REFRESH MATERIALIZED VIEW gmvi.inc.m")
    assert(modeOf("inc", "m") === "incremental")
    expectEqual("inc", "m", body)
  }

  test("zero-row append still takes the incremental path") {
    setup("zero")
    val body = "SELECT k, count(*) AS n FROM gmvi.zero.t GROUP BY k"
    sql(s"CREATE MATERIALIZED VIEW gmvi.zero.m AS $body")
    sql("INSERT INTO gmvi.zero.t SELECT k, a, x FROM gmvi.zero.t WHERE false")
    sql("REFRESH MATERIALIZED VIEW gmvi.zero.m")
    assert(modeOf("zero", "m") === "incremental")
    expectEqual("zero", "m", body)
  }

  test("maintenance commits in range keep the incremental path (round-11 'missing' #1)") {
    setup("maint")
    val body = "SELECT k, count(*) AS n, sum(a) AS sa FROM gmvi.maint.t GROUP BY k"
    sql(s"CREATE MATERIALIZED VIEW gmvi.maint.m AS $body")
    // append → nightly maintenance (metadata-only consolidation +
    // stats + properties) → append: content-identical commits must
    // not demote the refresh to a full recompute
    sql("INSERT INTO gmvi.maint.t VALUES ('g1', 3, 1.0)")
    val tPath = s"$wh/maint/t"
    LakeTable.rewriteManifests(spark, tPath)
    LakeTable.analyzeNdv(spark, tPath, Seq("k"))
    sql("INSERT INTO gmvi.maint.t VALUES ('g4', 40, 2.0)")
    sql("REFRESH MATERIALIZED VIEW gmvi.maint.m")
    assert(modeOf("maint", "m") === "incremental",
      "maintenance in range must stay transparent to the fold")
    expectEqual("maint", "m", body)
  }

  test("DML in range falls back to the full recompute") {
    setup("dml")
    val body = "SELECT k, count(*) AS n, sum(a) AS sa FROM gmvi.dml.t GROUP BY k"
    sql(s"CREATE MATERIALIZED VIEW gmvi.dml.m AS $body")
    sql("INSERT INTO gmvi.dml.t VALUES ('g1', 3, 1.0)")
    sql("UPDATE gmvi.dml.t SET a = a + 100 WHERE k = 'g2'")
    sql("REFRESH MATERIALIZED VIEW gmvi.dml.m")
    assert(modeOf("dml", "m") === "full",
      "appendsBetween refuses across DML → full recompute")
    expectEqual("dml", "m", body)
  }

  test("non-distributive bodies always recompute in full") {
    setup("nd")
    // (a) a post-wrapped aggregate — round(sum) of parts is not
    // round(sum) of the whole
    sql("CREATE MATERIALIZED VIEW gmvi.nd.wrapped AS " +
      "SELECT k, round(sum(x), 2) AS sx FROM gmvi.nd.t GROUP BY k")
    // (b) count(DISTINCT) — not distributive
    sql("CREATE MATERIALIZED VIEW gmvi.nd.dist AS " +
      "SELECT k, count(DISTINCT a) AS nd FROM gmvi.nd.t GROUP BY k")
    // (c) avg — not a direct sum/count/min/max alias
    sql("CREATE MATERIALIZED VIEW gmvi.nd.av AS " +
      "SELECT k, avg(x) AS ax FROM gmvi.nd.t GROUP BY k")
    // (d) a hidden group key — GROUP BY k but k not in the output:
    // merging by outputs would collapse distinct groups
    sql("CREATE MATERIALIZED VIEW gmvi.nd.hidden AS " +
      "SELECT count(*) AS n FROM gmvi.nd.t GROUP BY k")
    // (e) a self-join — delta substitution alone is wrong there
    sql("CREATE MATERIALIZED VIEW gmvi.nd.selfj AS " +
      "SELECT a.k AS k, count(*) AS n FROM gmvi.nd.t a " +
      "JOIN gmvi.nd.t b ON a.k = b.k GROUP BY a.k")
    sql("INSERT INTO gmvi.nd.t VALUES ('g1', 8, 2.5), ('g4', 1, 0.0)")
    for (v <- Seq("wrapped", "dist", "av", "hidden", "selfj")) {
      sql(s"REFRESH MATERIALIZED VIEW gmvi.nd.$v")
      assert(modeOf("nd", v) === "full",
        s"$v must refuse the incremental path")
    }
    expectEqual("nd", "wrapped",
      "SELECT k, round(sum(x), 2) AS sx FROM gmvi.nd.t GROUP BY k")
    expectEqual("nd", "selfj",
      "SELECT a.k AS k, count(*) AS n FROM gmvi.nd.t a " +
        "JOIN gmvi.nd.t b ON a.k = b.k GROUP BY a.k")
  }

  test("a hidden-partitioned source folds incrementally too") {
    val ns = "part"
    rmdir(s"$wh/$ns")
    sql(s"CREATE NAMESPACE IF NOT EXISTS gmvi.$ns")
    // PARTITIONED BY routes every INSERT through the hidden layout;
    // appendsBetween must read the partitioned appended manifests
    sql(s"CREATE TABLE gmvi.$ns.t (k STRING, a BIGINT, x DOUBLE) " +
      "USING graftlake PARTITIONED BY (bucket(2, a))")
    sql(s"INSERT INTO gmvi.$ns.t VALUES ('g1', 1, 1.5), ('g2', 10, 4.0)")
    val body = s"SELECT k, count(*) AS n, sum(x) AS sx FROM gmvi.$ns.t GROUP BY k"
    sql(s"CREATE MATERIALIZED VIEW gmvi.$ns.m AS $body")
    sql(s"INSERT INTO gmvi.$ns.t VALUES ('g1', 2, 0.5), ('g3', 7, 2.0)")
    sql(s"REFRESH MATERIALIZED VIEW gmvi.$ns.m")
    assert(modeOf(ns, "m") === "incremental",
      "a pure partitioned append must still take the O(delta) fold")
    expectEqual(ns, "m", body)
  }

  test("global aggregate (no GROUP BY) folds incrementally") {
    setup("glob")
    val body = "SELECT count(*) AS n, sum(a) AS sa, min(a) AS mn, " +
      "max(a) AS mx FROM gmvi.glob.t"
    sql(s"CREATE MATERIALIZED VIEW gmvi.glob.m AS $body")
    sql("INSERT INTO gmvi.glob.t VALUES ('g9', 1000, 1.0)")
    sql("REFRESH MATERIALIZED VIEW gmvi.glob.m")
    assert(modeOf("glob", "m") === "incremental")
    expectEqual("glob", "m", body)
  }

  test("FILTER clauses stay distributive; a filtered WHERE body folds too") {
    setup("filt")
    val body = "SELECT k, count(*) FILTER (WHERE a > 1) AS nbig, " +
      "sum(a) AS sa FROM gmvi.filt.t WHERE a >= 0 GROUP BY k"
    sql(s"CREATE MATERIALIZED VIEW gmvi.filt.m AS $body")
    sql("INSERT INTO gmvi.filt.t VALUES ('g1', 0, 1.0), ('g1', 50, 2.0), " +
      "('g2', -5, 3.0)")
    sql("REFRESH MATERIALIZED VIEW gmvi.filt.m")
    assert(modeOf("filt", "m") === "incremental")
    expectEqual("filt", "m", body)
  }
}
