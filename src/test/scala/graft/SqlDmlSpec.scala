package graft

import graft.sources.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL DML over lake tables (GraftSqlParser + LakeSqlDmlRule +
  * SupportsDelete): DELETE / UPDATE / MERGE INTO statements must
  * commit through the library ops, VERSION AS OF must pin snapshots
  * from SQL, and the unsupported shapes must refuse with an error
  * that names the contract. */
class SqlDmlSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import SparkSpec.rmdir

  private def freshTable(p: String, name: String): Unit = {
    rmdir(p)
    import spark.implicits._
    LakeTable.overwrite(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "s", "v"), p)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graftlake OPTIONS (path '$p')")
  }

  test("SQL DELETE commits a copy-on-write delete") {
    val p = "/tmp/graft_test/sqldml_delete"
    freshTable(p, "sqldml_del")
    try {
      spark.sql("DELETE FROM sqldml_del WHERE k >= 3 AND s != 'd'")
      assert(spark.sql("SELECT k FROM sqldml_del ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
      // the commit is a real snapshot: v0 still time-travels complete
      assert(LakeTable.read(spark, p, Some(0)).count() === 4)
      assert(LakeTable.history(spark, p).count() === 2)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_del")
  }

  test("SQL UPDATE rewrites predicate-true rows only") {
    val p = "/tmp/graft_test/sqldml_update"
    freshTable(p, "sqldml_upd")
    try {
      spark.sql("UPDATE sqldml_upd SET v = v * 2, s = concat(s, '!') WHERE k <= 2")
      val rows = spark.sql("SELECT k, s, v FROM sqldml_upd ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rows === Seq((1L, "a!", 20.0), (2L, "b!", 40.0),
        (3L, "c", 30.0), (4L, "d", 40.0)))
      assert(LakeTable.read(spark, p, Some(0)).count() === 4, "prior snapshot intact")
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_upd")
  }

  test("SQL MERGE INTO lowers onto mergeConditional with full clause order") {
    val p = "/tmp/graft_test/sqldml_merge"
    freshTable(p, "sqldml_mrg")
    import spark.implicits._
    Seq((2L, "B", 200.0), (3L, "C", 300.0), (9L, "z", 9.0), (10L, "y", 1.0))
      .toDF("k", "s", "v").createOrReplaceTempView("sqldml_mrg_src")
    try {
      spark.sql(
        """MERGE INTO sqldml_mrg t USING sqldml_mrg_src u ON t.k = u.k
          |WHEN MATCHED AND t.v < 25.0 THEN UPDATE SET s = u.s, v = u.v
          |WHEN MATCHED THEN DELETE
          |WHEN NOT MATCHED AND u.v > 5.0 THEN INSERT *
          |""".stripMargin)
      val rows = spark.sql("SELECT k, s, v FROM sqldml_mrg ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      // k=2 updated (v=20<25), k=3 deleted (v=30), k=9 inserted
      // (v=9>5), k=10 filtered out (v=1), k=1/4 untouched
      assert(rows === Seq((1L, "a", 10.0), (2L, "B", 200.0),
        (4L, "d", 40.0), (9L, "z", 9.0)))
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_mrg")
  }

  test("SQL MERGE with WHEN NOT MATCHED BY SOURCE") {
    val p = "/tmp/graft_test/sqldml_nmbs"
    freshTable(p, "sqldml_nmbs")
    import spark.implicits._
    Seq((1L, "A", 100.0)).toDF("k", "s", "v")
      .createOrReplaceTempView("sqldml_nmbs_src")
    try {
      spark.sql(
        """MERGE INTO sqldml_nmbs t USING sqldml_nmbs_src u ON t.k = u.k
          |WHEN MATCHED THEN UPDATE SET v = u.v
          |WHEN NOT MATCHED BY SOURCE AND t.k >= 4 THEN DELETE
          |""".stripMargin)
      val rows = spark.sql("SELECT k, v FROM sqldml_nmbs ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows === Seq((1L, 100.0), (2L, 20.0), (3L, 30.0)))
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_nmbs")
  }

  test("VERSION AS OF works for catalog tables and direct paths") {
    val p = "/tmp/graft_test/sqldml_tt"
    freshTable(p, "sqldml_tt")
    import spark.implicits._
    try {
      LakeTable.append(Seq((9L, "z", 90.0)).toDF("k", "s", "v"), p)
      assert(spark.sql("SELECT count(*) AS n FROM sqldml_tt").head.getLong(0) === 5)
      assert(spark.sql("SELECT count(*) AS n FROM sqldml_tt VERSION AS OF 0")
        .head.getLong(0) === 4)
      assert(spark.sql(s"SELECT count(*) AS n FROM graftlake.`$p` VERSION AS OF 0")
        .head.getLong(0) === 4)
      assert(spark.sql(s"SELECT count(*) AS n FROM graftlake.`$p`")
        .head.getLong(0) === 5)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_tt")
  }

  test("INSERT INTO / OVERWRITE and df.write land through the commit protocol") {
    val p = "/tmp/graft_test/sqldml_insert"
    freshTable(p, "sqldml_ins")
    import spark.implicits._
    try {
      // SQL INSERT INTO appends a new snapshot
      spark.sql("INSERT INTO sqldml_ins VALUES (9, 'z', 90.0)")
      assert(spark.sql("SELECT count(*) AS n FROM sqldml_ins").head.getLong(0) === 5)
      assert(LakeTable.history(spark, p).count() === 2, "insert = one commit")
      assert(LakeTable.read(spark, p, Some(0)).count() === 4, "v0 intact")
      // INSERT OVERWRITE replaces the snapshot (history preserved)
      spark.sql("INSERT OVERWRITE sqldml_ins VALUES (1, 'only', 1.0)")
      assert(spark.sql("SELECT count(*) AS n FROM sqldml_ins").head.getLong(0) === 1)
      assert(LakeTable.read(spark, p, Some(1)).count() === 5, "overwrite time-travels")
      // DataFrame writer API, append mode
      Seq((7L, "df", 7.0)).toDF("k", "s", "v")
        .write.format("graftlake").mode("append").save(p)
      assert(LakeTable.read(spark, p).count() === 2)
      // V2 writer API (df.writeTo) against the catalog table
      Seq((8L, "v2", 8.0)).toDF("k", "s", "v").writeTo("sqldml_ins").append()
      assert(LakeTable.read(spark, p).count() === 3)
      // path-form INSERT (the parser-resolved relation is insertable)
      spark.sql(s"INSERT INTO graftlake.`$p` VALUES (10, 'path', 10.0)")
      assert(LakeTable.read(spark, p).count() === 4)
      // CHECK constraints gate SQL inserts exactly like library appends
      LakeTable.addConstraint(spark, p, "pos_v", "v > 0")
      val e = intercept[Exception](
        spark.sql("INSERT INTO sqldml_ins VALUES (8, 'bad', -1.0)"))
      assert(e.getMessage.contains("pos_v"), e.getMessage)
      assert(LakeTable.read(spark, p).count() === 4, "violating batch left nothing")
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_ins")
  }

  test("OPTIMIZE binpacks small files; ZORDER BY rewrites clustered") {
    val p = "/tmp/graft_test/sqldml_optimize"
    rmdir(p)
    // five tiny single-file appends → binpack folds them
    (0 until 5).foreach { i =>
      LakeTable.append(spark.range(i * 20, (i + 1) * 20)
        .select(col("id").as("k"), (col("id") * 2.0).as("v")).coalesce(1), p)
    }
    val before = LakeTable.read(spark, p).agg(sum("k"), count(lit(1))).head
    spark.sql(s"OPTIMIZE graftlake.`$p`")
    assert(LakeTable.read(spark, p).agg(sum("k"), count(lit(1))).head === before)
    val packedFiles = LakeTable.entriesOf(p, LakeTable.latestVersion(p).get)
      .count(_.kind == "data")
    assert(packedFiles === 1, s"five tiny files must binpack to one, got $packedFiles")
    // ZORDER rewrite: content unchanged, clustering commit lands
    spark.sql(s"OPTIMIZE graftlake.`$p` ZORDER BY (k, v)")
    assert(LakeTable.read(spark, p).agg(sum("k"), count(lit(1))).head === before)
    val ops = LakeTable.history(spark, p).collect().map(_.getString(1))
    assert(ops.count(_ == "binpack") >= 1 && ops.contains("zorder"), ops.mkString(","))
  }

  test("VACUUM RETAIN expires old snapshots and sweeps orphans") {
    val p = "/tmp/graft_test/sqldml_vacuum"
    rmdir(p)
    val df = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2.0).as("v"))
    LakeTable.overwrite(df, p) // v0
    LakeTable.compact(spark, p) // v1 (rewrites every file)
    LakeTable.compact(spark, p) // v2
    spark.sql(s"VACUUM graftlake.`$p` RETAIN 1 VERSIONS")
    // only the latest snapshot survives; content intact
    assert(LakeTable.read(spark, p).count() === 100)
    intercept[Exception](LakeTable.read(spark, p, Some(0)).collect())
    intercept[Exception](LakeTable.read(spark, p, Some(1)).collect())
    // plain VACUUM on a healthy table is a no-op sweep, still succeeds
    spark.sql(s"VACUUM graftlake.`$p`")
    assert(LakeTable.read(spark, p).count() === 100)
  }

  test("ALTER TABLE ADD/DROP PARTITION FIELD and WRITE ORDERED BY evolve declarations") {
    import LakeTable.PartitionTransform
    val p = "/tmp/graft_test/sqldml_alterpart"
    rmdir(p)
    LakeTable.append(spark.range(0, 200)
      .select(col("id").as("k"), (col("id") % 5).as("day"),
        (col("id") * 2.0).as("v")), p)
    spark.sql(s"ALTER TABLE graftlake.`$p` ADD PARTITION FIELD day")
    spark.sql(s"ALTER TABLE graftlake.`$p` ADD PARTITION FIELD bucket(4, k)")
    assert(LakeTable.partitionSpecOf(p) == Seq(
      PartitionTransform("day", "identity"), PartitionTransform("k", "bucket", 4)))
    // a fresh append lands under the evolved layout; old files keep theirs
    LakeTable.append(spark.range(200, 300)
      .select(col("id").as("k"), (col("id") % 5).as("day"),
        (col("id") * 2.0).as("v")), p)
    val files = LakeTable.entriesOf(p, LakeTable.latestVersion(p).get).map(_.file)
    assert(files.exists(f => f.contains("__p_identity_day=") && f.contains("__p_bucket4_k=")),
      s"new files must carry the declared layout: $files")
    assert(LakeTable.read(spark, p).count() === 300)
    // duplicates and unknown fields refuse loudly
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graftlake.`$p` ADD PARTITION FIELD day")
    }.getMessage.contains("already declared"))
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graftlake.`$p` DROP PARTITION FIELD days(nope)")
    }.getMessage.contains("not a table column"))
    spark.sql(s"ALTER TABLE graftlake.`$p` DROP PARTITION FIELD bucket(4, k)")
    spark.sql(s"ALTER TABLE graftlake.`$p` DROP PARTITION FIELD day")
    assert(LakeTable.partitionSpecOf(p).isEmpty)
    // declared write order rides the same evolution surface
    spark.sql(s"ALTER TABLE graftlake.`$p` WRITE ORDERED BY k, day")
    assert(LakeTable.sortOrderOf(p) == Seq("k", "day"))
    spark.sql(s"ALTER TABLE graftlake.`$p` WRITE UNORDERED")
    assert(LakeTable.sortOrderOf(p).isEmpty)
  }

  test("RESTORE TABLE rolls forward to an old snapshot's content") {
    val p = "/tmp/graft_test/sqldml_restore"
    rmdir(p)
    LakeTable.overwrite(spark.range(0, 10).select(col("id").as("k")), p) // v0
    Thread.sleep(120)
    LakeTable.append(spark.range(10, 30).select(col("id").as("k")), p) // v1
    spark.sql(s"RESTORE TABLE graftlake.`$p` TO VERSION AS OF 0")
    assert(LakeTable.read(spark, p).count() === 10)
    // history moved FORWARD (v2 = restore commit); v1 stays travelable
    assert(LakeTable.latestVersion(p).get === 2)
    assert(LakeTable.read(spark, p, Some(1)).count() === 30)
    // timestamp form resolves through versionAsOf (v1's wall-time)
    val t1 = LakeTable.snapshots(spark, p).filter(col("version") === 1)
      .head.getAs[Long]("committed_at")
    spark.sql(s"RESTORE TABLE graftlake.`$p` TO TIMESTAMP AS OF '$t1'")
    assert(LakeTable.read(spark, p).count() === 30)
  }

  test("branch/tag DDL and VACUUM OLDER THAN route to the ref machinery") {
    val p = "/tmp/graft_test/sqldml_refs"
    rmdir(p)
    LakeTable.overwrite(spark.range(0, 10).select(col("id").as("k")), p) // v0
    LakeTable.append(spark.range(10, 30).select(col("id").as("k")), p) // v1
    spark.sql(s"ALTER TABLE graftlake.`$p` CREATE TAG stable AS OF VERSION 0")
    assert(LakeTable.tags(p) == Map("stable" -> 0))
    spark.sql(s"ALTER TABLE graftlake.`$p` CREATE BRANCH dev")
    LakeTable.append(spark.range(100, 110).select(col("id").as("k")),
      LakeTable.branchPath(p, "dev"))
    spark.sql(s"ALTER TABLE graftlake.`$p` FAST FORWARD dev")
    assert(LakeTable.read(spark, p).count() === 40)
    // dev's fast-forwarded manifests are referenced by main, so
    // dropping it refuses (dropBranch contract) — drop a scratch
    // branch instead
    spark.sql(s"ALTER TABLE graftlake.`$p` CREATE BRANCH scratch")
    spark.sql(s"ALTER TABLE graftlake.`$p` DROP BRANCH scratch")
    assert(LakeTable.branches(p).toSet == Set("dev"))
    spark.sql(s"ALTER TABLE graftlake.`$p` DROP TAG stable")
    assert(LakeTable.tags(p).isEmpty)
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graftlake.`$p` DROP TAG stable")
    }.getMessage.contains("no such tag"))
    // VACUUM OLDER THAN: everything before 'now' expires except the
    // latest (always pinned)
    spark.sql(s"VACUUM graftlake.`$p` OLDER THAN '${System.currentTimeMillis()}'")
    val live = (0 to LakeTable.latestVersion(p).get).filter(v =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$p/_graft_meta/v$v")))
    assert(live.size === 1, s"only the head survives: $live")
    assert(LakeTable.read(spark, p).count() === 40)
  }

  test("VERSION AS OF resolves tag and branch names (Iceberg ref-as-version)") {
    val p = "/tmp/graft_test/sqldml_refver"
    rmdir(p)
    LakeTable.overwrite(spark.range(0, 10).select(col("id").as("k")), p) // v0
    LakeTable.append(spark.range(10, 30).select(col("id").as("k")), p) // v1
    spark.sql(s"ALTER TABLE graftlake.`$p` CREATE TAG first AS OF VERSION 0")
    spark.sql(s"ALTER TABLE graftlake.`$p` CREATE BRANCH work")
    LakeTable.append(spark.range(100, 105).select(col("id").as("k")),
      LakeTable.branchPath(p, "work"))
    // path route: tag pins a main-chain version, branch reads ITS head
    assert(spark.sql(s"SELECT count(*) FROM graftlake.`$p` VERSION AS OF 'first'")
      .head.getLong(0) === 10L)
    assert(spark.sql(s"SELECT count(*) FROM graftlake.`$p` VERSION AS OF 'work'")
      .head.getLong(0) === 35L, "a branch resolves to its own chain's head")
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graftlake.`$p` VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("neither an integer version"), e.getMessage)
    // catalog route: TableCatalog.loadTable(ident, version) gets the
    // same tag/branch resolution
    spark.conf.set("spark.sql.catalog.refv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.refv.warehouse", "/tmp/graft_test/sqldml_refv_wh")
    try {
      rmdir("/tmp/graft_test/sqldml_refv_wh/db")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS refv.db")
      spark.sql("CREATE TABLE refv.db.t (k BIGINT) USING graftlake")
      spark.sql("INSERT INTO refv.db.t SELECT id FROM range(0, 7)") // v1
      val cp = "/tmp/graft_test/sqldml_refv_wh/db/t"
      LakeTable.tag(cp, "seven", 1)
      spark.sql("INSERT INTO refv.db.t SELECT id FROM range(7, 20)") // v2
      LakeTable.createBranch(spark, cp, "side")
      LakeTable.append(spark.range(100, 103).select(col("id").as("k")),
        LakeTable.branchPath(cp, "side"))
      assert(spark.sql("SELECT count(*) FROM refv.db.t VERSION AS OF 'seven'")
        .head.getLong(0) === 7L)
      assert(spark.sql("SELECT count(*) FROM refv.db.t VERSION AS OF 'side'")
        .head.getLong(0) === 23L)
    } finally {
      spark.conf.unset("spark.sql.catalog.refv")
      spark.conf.unset("spark.sql.catalog.refv.warehouse")
    }
  }

  test("TIMESTAMP AS OF resolves a version via commit wall-time (SQL + reader option)") {
    val p = "/tmp/graft_test/sqldml_tsasof"
    rmdir(p)
    LakeTable.overwrite(spark.range(0, 10).select(col("id").as("k")), p) // v0
    Thread.sleep(120)
    LakeTable.append(spark.range(10, 30).select(col("id").as("k")), p) // v1
    val t0 = LakeTable.snapshots(spark, p).filter(col("version") === 0)
      .head.getAs[Long]("committed_at")
    // reader option: epoch millis and ISO instant forms
    assert(spark.read.format("graftlake").option("timestampAsOf", t0.toString)
      .load(p).count() === 10)
    val iso = java.time.Instant.ofEpochMilli(t0).toString
    assert(spark.read.format("graftlake").option("timestampAsOf", iso)
      .load(p).count() === 10)
    // SQL literal-string form through the delegating parser
    assert(spark.sql(
      s"SELECT count(*) FROM graftlake.`$p` TIMESTAMP AS OF '$iso'")
      .head.getLong(0) === 10)
    // current read unaffected; pre-table timestamps refuse loudly
    assert(LakeTable.read(spark, p).count() === 30)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graftlake").option("timestampAsOf", (t0 - 500000).toString)
        .load(p).count()
    }
    assert(e.getMessage.contains("committed at or before"))
    assert(intercept[IllegalArgumentException] {
      spark.read.format("graftlake").option("timestampAsOf", "yesterday-ish")
        .load(p).count()
    }.getMessage.contains("cannot parse"))
  }

  test("timestampAsOf works on CATALOG-managed tables (no path option in scan)") {
    // the catalog route reaches newScanBuilder with no path/location
    // option — timestampAsOf must resolve against the table's own
    // path, exactly like versionAsOf does (round-9 advice item)
    val root = "/tmp/graft_test/sqldml_tscat"
    rmdir(root)
    spark.conf.set("spark.sql.catalog.tsc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tsc.warehouse", root)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tsc.db")
      spark.sql("CREATE TABLE tsc.db.t (k BIGINT) USING graftlake")
      spark.sql("INSERT INTO tsc.db.t VALUES (1), (2)") // v1
      Thread.sleep(120)
      val p = s"$root/db/t"
      val t1 = LakeTable.snapshots(spark, p).filter(col("version") === 1)
        .head.getAs[Long]("committed_at")
      spark.sql("INSERT INTO tsc.db.t VALUES (3), (4), (5)") // v2
      // Spark's own TimeTravelSpec requires a TIMESTAMP-castable
      // string on the catalog route (it resolves via
      // loadTable(ident, micros)) — ISO instant, not epoch millis
      val iso = java.time.Instant.ofEpochMilli(t1).toString
      assert(spark.read.option("timestampAsOf", iso)
        .table("tsc.db.t").count() === 2)
      assert(spark.table("tsc.db.t").count() === 5)
    } finally {
      spark.conf.unset("spark.sql.catalog.tsc")
      spark.conf.unset("spark.sql.catalog.tsc.warehouse")
    }
  }

  test("ANALYZE TABLE ... FOR COLUMNS attaches NDV sketches on lake tables") {
    val p = "/tmp/graft_test/sqldml_analyze"
    rmdir(p)
    LakeTable.append(spark.range(0, 3000)
      .select((col("id") % 120).as("k"), (col("id") % 7).as("g")), p)
    spark.sql(s"ANALYZE TABLE graftlake.`$p` COMPUTE STATISTICS FOR COLUMNS k, g")
    // both columns answer from manifests alone; coupon mode → exact
    assert(LakeTable.approxCountDistinct(spark, p, "k") === 120L)
    assert(LakeTable.approxCountDistinct(spark, p, "g") === 7L)
    assert(LakeTable.history(spark, p).collect().map(_.getString(1))
      .contains("analyze"))
    // FOR ALL COLUMNS sketches every sketchable column (and only those)
    LakeTable.append(spark.range(0, 10)
      .select((col("id") % 3).as("k"), (col("id") % 2).as("g")), p)
    spark.sql(s"ANALYZE TABLE graftlake.`$p` COMPUTE STATISTICS FOR ALL COLUMNS")
    assert(LakeTable.approxCountDistinct(spark, p, "k") === 120L)
    // a non-sketchable type refuses by name
    val p2 = "/tmp/graft_test/sqldml_analyze_dbl"
    rmdir(p2)
    LakeTable.append(spark.range(0, 10)
      .select(col("id").as("k"), (col("id") * 1.5).as("v")), p2)
    assert(intercept[IllegalArgumentException] {
      LakeTable.analyzeNdv(spark, p2, Seq("v"))
    }.getMessage.contains("DOUBLE"))
  }

  test("maintenance SQL resolves GraftCatalog tables; refuses non-lake targets") {
    spark.conf.set("spark.sql.catalog.graft_m", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_m.warehouse", "/tmp/graft_test/sqldml_wh")
    rmdir("/tmp/graft_test/sqldml_wh/dbm")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_m.dbm")
    spark.sql("CREATE TABLE graft_m.dbm.t (k BIGINT, v DOUBLE) USING graftlake")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO graft_m.dbm.t SELECT id, id * 1.0 FROM range(${i * 10}, ${i * 10 + 10})")
    }
    spark.sql("OPTIMIZE graft_m.dbm.t")
    assert(spark.sql("SELECT count(*) AS n FROM graft_m.dbm.t").head.getLong(0) === 30L)
    val e = intercept[Exception](spark.sql("OPTIMIZE graft_m.dbm.nope"))
    assert(e.getMessage.contains("not a lake table"), e.getMessage)
  }

  test("unsupported merge shapes refuse loudly") {
    val p = "/tmp/graft_test/sqldml_refuse"
    freshTable(p, "sqldml_ref")
    import spark.implicits._
    Seq((1L, "A", 1.0)).toDF("k", "s", "v")
      .createOrReplaceTempView("sqldml_ref_src")
    try {
      // non-equi ON
      val e1 = intercept[Exception](spark.sql(
        """MERGE INTO sqldml_ref t USING sqldml_ref_src u ON t.k < u.k
          |WHEN MATCHED THEN DELETE""".stripMargin))
      assert(e1.getMessage.contains("target.k = source.k"), e1.getMessage)
      // non-identity INSERT mapping
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO sqldml_ref t USING sqldml_ref_src u ON t.k = u.k
          |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (u.k, 'fixed', u.v)
          |""".stripMargin))
      assert(e2.getMessage.contains("identity column mapping"), e2.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_ref")
  }

  test("INSERT INTO ... REPLACE WHERE scopes the overwrite to the slice") {
    val p = "/tmp/graft_test/sqldml_rpw"
    freshTable(p, "sqldml_rpw")
    try {
      // replace the k<=2 slice with fresh rows, one commit
      spark.sql("INSERT INTO sqldml_rpw REPLACE WHERE k <= 2 " +
        "SELECT * FROM VALUES (1L, 'A', 11.0), (2L, 'B', 22.0) AS t(k, s, v)")
      assert(spark.sql("SELECT s FROM sqldml_rpw ORDER BY k")
        .collect().map(_.getString(0)).toSeq === Seq("A", "B", "c", "d"),
        "in-slice rows replaced, out-of-slice untouched")
      assert(LakeTable.history(spark, p).count() === 2,
        "REPLACE WHERE is ONE commit (delete half + insert half)")
      assert(LakeTable.read(spark, p, Some(0))
        .filter(col("s").isin("a", "b")).count() === 2,
        "v0 time-travels to the pre-replace slice")
      // enforcement: a batch outside its declared slice refuses by name
      val e = intercept[Exception](spark.sql(
        "INSERT INTO sqldml_rpw REPLACE WHERE k > 100 " +
          "SELECT * FROM VALUES (5L, 'x', 1.0) AS t(k, s, v)"))
      assert(e.getMessage.contains("NOT matching"), e.getMessage)
      // the V2 writer route lands on the same path
      import spark.implicits._
      Seq((3L, "C", 33.0)).toDF("k", "s", "v")
        .writeTo("sqldml_rpw").overwrite(col("k") === 3L)
      assert(spark.sql("SELECT s FROM sqldml_rpw ORDER BY k")
        .collect().map(_.getString(0)).toSeq === Seq("A", "B", "C", "d"))
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_rpw")
  }

  test("DELETE WHERE k IN (SELECT ...) lowers onto the file-granular merge") {
    val p = "/tmp/graft_test/sqldml_del_in"
    freshTable(p, "sqldml_din")
    import spark.implicits._
    Seq(2L, 3L, 99L).toDF("doc").createOrReplaceTempView("sqldml_din_bad")
    try {
      spark.sql(
        "DELETE FROM sqldml_din WHERE k IN (SELECT doc FROM sqldml_din_bad)")
      assert(spark.sql("SELECT k FROM sqldml_din ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 4L))
      // real snapshot: v0 time-travels complete
      assert(LakeTable.read(spark, p, Some(0)).count() === 4)
      // residual plain conjunct scopes the delete
      spark.sql("DELETE FROM sqldml_din WHERE k IN " +
        "(SELECT doc FROM sqldml_din_bad UNION ALL SELECT 1) AND s = 'a'")
      assert(spark.sql("SELECT k FROM sqldml_din ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(4L),
        "only the residual-matching row deletes")
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_din")
  }

  test("DELETE WHERE NOT IN pins SQL null semantics") {
    val p = "/tmp/graft_test/sqldml_del_notin"
    freshTable(p, "sqldml_dni")
    import spark.implicits._
    try {
      // a NULL in the list: NOT IN is never true — zero rows delete
      Seq(Some(1L), None).toDF("doc").createOrReplaceTempView("sqldml_dni_keys")
      spark.sql(
        "DELETE FROM sqldml_dni WHERE k NOT IN (SELECT doc FROM sqldml_dni_keys)")
      assert(spark.sql("SELECT count(*) FROM sqldml_dni").head().getLong(0) === 4L,
        "NULL in a NOT IN list must delete nothing")
      // no NULLs: delete exactly the non-listed keys
      Seq(1L, 4L).toDF("doc").createOrReplaceTempView("sqldml_dni_keys2")
      spark.sql(
        "DELETE FROM sqldml_dni WHERE k NOT IN (SELECT doc FROM sqldml_dni_keys2)")
      assert(spark.sql("SELECT k FROM sqldml_dni ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 4L))
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_dni")
  }

  test("DELETE WHERE EXISTS / NOT EXISTS decompose the equi-correlation") {
    val p = "/tmp/graft_test/sqldml_del_exists"
    freshTable(p, "sqldml_dex")
    import spark.implicits._
    Seq((2L, "x"), (4L, "y")).toDF("doc", "why")
      .createOrReplaceTempView("sqldml_dex_bad")
    try {
      spark.sql("DELETE FROM sqldml_dex t WHERE EXISTS " +
        "(SELECT 1 FROM sqldml_dex_bad b WHERE b.doc = t.k AND b.why = 'x')")
      assert(spark.sql("SELECT k FROM sqldml_dex ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
      spark.sql("DELETE FROM sqldml_dex t WHERE NOT EXISTS " +
        "(SELECT 1 FROM sqldml_dex_bad b WHERE b.doc = t.k)")
      assert(spark.sql("SELECT k FROM sqldml_dex ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(4L),
        "NOT EXISTS keeps only correlated keys")
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_dex")
  }

  test("unsupported subquery-DELETE shapes refuse by name") {
    val p = "/tmp/graft_test/sqldml_del_refuse"
    freshTable(p, "sqldml_dref")
    import spark.implicits._
    Seq(1L).toDF("doc").createOrReplaceTempView("sqldml_dref_keys")
    try {
      // two subquery predicates in one statement
      val e1 = intercept[Exception](spark.sql(
        "DELETE FROM sqldml_dref WHERE k IN (SELECT doc FROM sqldml_dref_keys) " +
          "AND k IN (SELECT doc + 1 FROM sqldml_dref_keys)"))
      assert(e1.getMessage.contains("exactly ONE"), e1.getMessage)
      // EXISTS without an equi-correlation
      val e2 = intercept[Exception](spark.sql(
        "DELETE FROM sqldml_dref t WHERE EXISTS " +
          "(SELECT 1 FROM sqldml_dref_keys b WHERE b.doc > t.k)"))
      assert(e2.getMessage.contains("equi-correlation"), e2.getMessage)
      // a CORRELATED subquery inside a MERGE clause names the fix
      // (uncorrelated SCALARS lower by value since round 13 — see the
      // dedicated test)
      spark.sql("SELECT doc AS k FROM sqldml_dref_keys")
        .createOrReplaceTempView("sqldml_dref_src")
      val e3 = intercept[Exception](spark.sql(
        "MERGE INTO sqldml_dref t USING sqldml_dref_src u ON t.k = u.k " +
          "WHEN MATCHED AND t.v > (SELECT avg(b.doc) FROM sqldml_dref_keys b " +
          "WHERE b.doc = t.k) THEN DELETE"))
      assert(e3.getMessage.contains("precompute correlated or keyed"), e3.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_dref")
  }

  test("UPDATE WHERE <subquery> lowers onto the merge with SQL null semantics") {
    val p = "/tmp/graft_test/sqldml_upd_subq"
    freshTable(p, "sqldml_usq")
    import spark.implicits._
    Seq(2L, 3L).toDF("doc").createOrReplaceTempView("sqldml_usq_keys")
    try {
      // IN: only listed keys update; SET may reference the row's own columns
      spark.sql("UPDATE sqldml_usq SET v = v * 10 WHERE k IN " +
        "(SELECT doc FROM sqldml_usq_keys)")
      assert(spark.sql("SELECT k, v FROM sqldml_usq ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
        === Seq((1L, 10.0), (2L, 200.0), (3L, 300.0), (4L, 40.0)))
      // NOT IN with a NULL in the list: never true — nothing changes
      Seq(Some(2L), None).toDF("doc").createOrReplaceTempView("sqldml_usq_null")
      spark.sql("UPDATE sqldml_usq SET v = 0 WHERE k NOT IN " +
        "(SELECT doc FROM sqldml_usq_null)")
      assert(spark.sql("SELECT sum(v) FROM sqldml_usq").head().getDouble(0)
        === 550.0, "NULL in a NOT IN list must update nothing")
      // NOT EXISTS: uncorrelated keys update
      spark.sql("UPDATE sqldml_usq t SET s = 'cold' WHERE NOT EXISTS " +
        "(SELECT 1 FROM sqldml_usq_keys b WHERE b.doc = t.k)")
      assert(spark.sql("SELECT k FROM sqldml_usq WHERE s = 'cold' ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 4L))
      // residual conjunct scopes the update
      spark.sql("UPDATE sqldml_usq SET s = 'hot' WHERE k IN " +
        "(SELECT doc FROM sqldml_usq_keys) AND v >= 300")
      assert(spark.sql("SELECT k FROM sqldml_usq WHERE s = 'hot'").collect()
        .map(_.getLong(0)).toSeq === Seq(3L))
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_usq")
  }

  test("scalar subqueries in DML lower by value: DELETE threshold, UPDATE SET") {
    val p = "/tmp/graft_test/sqldml_scalar"
    freshTable(p, "sqldml_sc")
    import spark.implicits._
    Seq(10.0, 30.0).toDF("x").createOrReplaceTempView("sqldml_sc_stats")
    try {
      // DELETE ... WHERE v > (SELECT avg(x) ...): threshold evaluates
      // once, the file-granular planner sees a plain predicate
      spark.sql("DELETE FROM sqldml_sc WHERE v > (SELECT avg(x) FROM sqldml_sc_stats)")
      assert(spark.sql("SELECT k FROM sqldml_sc ORDER BY k").collect()
        .map(_.getLong(0)).toSeq === Seq(1L, 2L))
      // UPDATE SET v = (SELECT max(x) ...) WHERE scalar condition
      spark.sql("UPDATE sqldml_sc SET v = (SELECT max(x) FROM sqldml_sc_stats) " +
        "WHERE k >= (SELECT min(x) FROM sqldml_sc_stats) / 5")
      assert(spark.sql("SELECT k, v FROM sqldml_sc ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
        === Seq((1L, 10.0), (2L, 30.0)))
      // SET scalar + keyed WHERE combine: materialized value rides the merge
      Seq(1L).toDF("doc").createOrReplaceTempView("sqldml_sc_keys")
      spark.sql("UPDATE sqldml_sc SET v = (SELECT sum(x) FROM sqldml_sc_stats) " +
        "WHERE k IN (SELECT doc FROM sqldml_sc_keys)")
      assert(spark.sql("SELECT v FROM sqldml_sc WHERE k = 1").head().getDouble(0) === 40.0)
      // zero-row scalar subquery = NULL (predicate unknown -> no rows)
      spark.sql("DELETE FROM sqldml_sc WHERE v > (SELECT x FROM sqldml_sc_stats WHERE x > 999)")
      assert(spark.sql("SELECT count(*) FROM sqldml_sc").head().getLong(0) === 2L)
      // >1-row scalar subquery refuses loudly
      val e = intercept[Exception](spark.sql(
        "DELETE FROM sqldml_sc WHERE v > (SELECT x FROM sqldml_sc_stats)"))
      assert(e.getMessage.contains("more than one row"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_sc")
  }

  test("write.<kind>.mode=merge-on-read routes SQL DML; results equal CoW") {
    val pM = "/tmp/graft_test/sqldml_mode_mor"
    val pC = "/tmp/graft_test/sqldml_mode_cow"
    rmdir(pM); rmdir(pC)
    import spark.implicits._
    val rows = (1L to 12L).map(i => (i, s"s$i", i * 10.0))
    for ((p, name) <- Seq(pM -> "sqldml_morm", pC -> "sqldml_coww")) {
      LakeTable.overwrite(rows.toDF("k", "s", "v"), p)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name USING graftlake OPTIONS (path '$p')")
    }
    // the library call, not SQL ALTER: a session-catalog table's
    // ALTER lands in Spark's own catalog, never the lake sidecar
    LakeTable.setTableProperties(spark, pM, Map(
      "write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read",
      "write.merge.mode" -> "merge-on-read"))
    Seq((2L, "m2", 999.0), (20L, "m20", 2000.0)).toDF("k", "s", "v")
      .createOrReplaceTempView("sqldml_mode_src")
    try {
      for (name <- Seq("sqldml_morm", "sqldml_coww")) {
        // pmod arithmetic: NOT V2-filter-expressible — on the CoW twin
        // this pins the new non-pushable plain-DELETE lowering
        spark.sql(s"DELETE FROM $name WHERE k % 5 = 0")
        spark.sql(s"UPDATE $name SET v = v + 0.5 WHERE k <= 3")
        spark.sql(s"""MERGE INTO $name t USING sqldml_mode_src u ON t.k = u.k
          |WHEN MATCHED THEN UPDATE SET s = u.s, v = u.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      def state(p: String) = LakeTable.read(spark, p).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(state(pM) === state(pC),
        "merge-on-read and copy-on-write must produce identical content")
      val opsM = LakeTable.history(spark, pM).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(opsM(1) === "set_properties" && opsM(2) === "mor_posdelete" &&
        opsM(3) === "mor_update" && opsM(4) === "mor_merge", opsM.toString)
      val opsC = LakeTable.history(spark, pC).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(opsC(1) === "delete" && opsC(2) === "update" &&
        opsC(3) === "merge", opsC.toString)
      // compact folds the MoR state away; content unchanged
      LakeTable.compact(spark, pM)
      assert(state(pM) === state(pC), "compacted MoR content must not move")
      // bad mode value refuses at the ALTER, not at the first DML
      val e = intercept[IllegalArgumentException](
        LakeTable.setTableProperties(spark, pM,
          Map("write.delete.mode" -> "positional")))
      assert(e.getMessage.contains("expected copy-on-write or merge-on-read"),
        e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS sqldml_morm")
      spark.sql("DROP TABLE IF EXISTS sqldml_coww")
    }
  }

  test("an inner alias shadowing the target alias is NOT a correlation") {
    val p = "/tmp/graft_test/sqldml_shadow"
    freshTable(p, "sqldml_shadow")
    import spark.implicits._
    Seq((5L, 100.0), (5L, 300.0), (6L, 999.0))
      .toDF("c", "x").createOrReplaceTempView("sqldml_shadow_ref")
    try {
      // the inner 't' shadows the target alias by SQL scoping: this
      // is an UNCORRELATED scalar filtered INSIDE ref (max x where
      // c=5 -> 300), applied to every WHERE row — treating 't.c = 5'
      // as an equi-correlation would regroup by the literal and drop
      // the filter, silently producing wrong values
      spark.sql("UPDATE sqldml_shadow t SET v = (SELECT max(t.x) FROM " +
        "sqldml_shadow_ref t WHERE t.c = 5) WHERE t.k <= 2")
      val rows = spark.sql("SELECT k, v FROM sqldml_shadow ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows === Seq((1L, 300.0), (2L, 300.0), (3L, 30.0), (4L, 40.0)),
        rows.mkString(", "))
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_shadow")
  }

  test("isolation level follows the STATEMENT kind through merge-shaped lowerings") {
    val p = "/tmp/graft_test/sqldml_isokind"
    freshTable(p, "sqldml_isokind")
    import spark.implicits._
    Seq(1L, 3L).toDF("doc").createOrReplaceTempView("sqldml_isokind_keys")
    val arb = new graft.sources.RaceInjectionArbiter
    LakeTable.setCommitArbiter(p, arb)
    try {
      // write.MERGE.isolation-level=serializable must NOT govern a
      // keyed DELETE statement (it lowers onto a merge commit but
      // answers to write.DELETE.*): the race rebases
      LakeTable.setTableProperties(spark, p,
        Map("write.merge.isolation-level" -> "serializable"))
      arb.armRace(() =>
        LakeTable.append(Seq((50L, "r", 1.0)).toDF("k", "s", "v"), p): Unit)
      spark.sql("DELETE FROM sqldml_isokind WHERE k IN " +
        "(SELECT doc FROM sqldml_isokind_keys)")
      assert(spark.sql("SELECT k FROM sqldml_isokind ORDER BY k").collect()
        .map(_.getLong(0)).toSeq === Seq(2L, 4L, 50L),
        "merge-level serializable must not refuse a DELETE statement's race")
      // write.DELETE.isolation-level=serializable DOES govern it —
      // no row filter is derivable for the keyed form, so any racer
      // rows conflict (Iceberg's alwaysTrue default)
      LakeTable.setTableProperties(spark, p,
        Map("write.delete.isolation-level" -> "serializable"))
      arb.armRace(() =>
        LakeTable.append(Seq((51L, "r2", 1.0)).toDF("k", "s", "v"), p): Unit)
      val e = intercept[Exception](spark.sql(
        "DELETE FROM sqldml_isokind WHERE k IN " +
          "(SELECT doc FROM sqldml_isokind_keys)"))
      assert(e.getMessage.contains("serializable"), e.getMessage)
    } finally LakeTable.setCommitArbiter(p, graft.sources.RenameArbiter)
  }

  test("MERGE over a composite ON key lowers onto the multi-key merge") {
    val p = "/tmp/graft_test/sqldml_mcomp"
    rmdir(p)
    import spark.implicits._
    LakeTable.overwrite(Seq(
      (1L, 1, "a", 10.0), (1L, 2, "b", 20.0), (2L, 1, "c", 30.0)
    ).toDF("k1", "k2", "s", "v"), p)
    spark.sql("DROP TABLE IF EXISTS sqldml_mcomp")
    spark.sql(s"CREATE TABLE sqldml_mcomp USING graftlake OPTIONS (path '$p')")
    // k1=1 repeats across k2 — a single-key merge on k1 would refuse
    // this source as duplicate-keyed; the composite key is the point
    Seq((1L, 1, "A", 100.0), (1L, 2, "B", 200.0), (3L, 1, "n", 99.0))
      .toDF("k1", "k2", "s", "v").createOrReplaceTempView("sqldml_mcomp_src")
    try {
      spark.sql(
        """MERGE INTO sqldml_mcomp t USING sqldml_mcomp_src u
          |ON t.k1 = u.k1 AND t.k2 = u.k2
          |WHEN MATCHED AND u.v >= 200.0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET s = u.s, v = u.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val rows = spark.sql("SELECT k1, k2, s, v FROM sqldml_mcomp ORDER BY k1, k2")
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
      assert(rows === Seq(
        (1L, 1, "A", 100.0), // matched tuple (1,1): update
        // (1,2) matched with u.v=200: deleted
        (2L, 1, "c", 30.0),  // untouched
        (3L, 1, "n", 99.0)), // source-only tuple: insert
        rows.mkString(", "))
      // a source duplicated on the FULL composite still refuses
      Seq((1L, 1, "x", 1.0), (1L, 1, "y", 2.0))
        .toDF("k1", "k2", "s", "v").createOrReplaceTempView("sqldml_mcomp_dup")
      val e = intercept[Exception](spark.sql(
        """MERGE INTO sqldml_mcomp t USING sqldml_mcomp_dup u
          |ON t.k1 = u.k1 AND t.k2 = u.k2
          |WHEN MATCHED THEN UPDATE SET v = u.v""".stripMargin))
      assert(e.getMessage.contains("duplicate keys"), e.getMessage)
      // a non-equi conjunct in ON refuses by name
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO sqldml_mcomp t USING sqldml_mcomp_src u
          |ON t.k1 = u.k1 AND t.v < u.v
          |WHEN MATCHED THEN DELETE""".stripMargin))
      assert(e2.getMessage.contains("same-named key"), e2.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_mcomp")
  }

  test("SQL reads lift MoR-state snapshots onto the library read") {
    val p = "/tmp/graft_test/sqldml_lift"
    freshTable(p, "sqldml_lift")
    try {
      LakeTable.deleteMoR(spark, p, "k", col("k") === 2L) // live eq delete
      // the V2 scan refuses this snapshot; the lift serves it — both
      // the path route and the session-catalog name route
      assert(spark.sql(s"SELECT k FROM graftlake.`$p` ORDER BY k").collect()
        .map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
      assert(spark.sql("SELECT count(*) AS n FROM sqldml_lift")
        .head.getLong(0) === 3L)
      // composes: self-join over the lifted relation
      assert(spark.sql("SELECT a.k FROM sqldml_lift a JOIN sqldml_lift b " +
        "ON a.k = b.k ORDER BY a.k").collect().map(_.getLong(0)).toSeq
        === Seq(1L, 3L, 4L))
      // time travel: v0 (pre-delete) has no MoR state and stays on the
      // V2 scan; the MoR head already proved the lifted route above
      assert(spark.sql(s"SELECT count(*) AS n FROM graftlake.`$p` " +
        "VERSION AS OF 0").head.getLong(0) === 4L)
      // DML/write targets keep their V2 relation (shield): INSERT,
      // UPDATE and DELETE all work against the MoR-state table
      spark.sql("INSERT INTO sqldml_lift VALUES (9, 'i', 90.0)")
      spark.sql("UPDATE sqldml_lift SET v = v + 1 WHERE k = 9")
      spark.sql("DELETE FROM sqldml_lift WHERE k = 1")
      assert(spark.sql("SELECT k, v FROM sqldml_lift ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(2 - 1))).toSeq ===
        Seq((3L, 30.0), (4L, 40.0), (9L, 91.0)))
      // plan shape: the MoR-state read is the LIFTED library plan (no
      // V2 batch scan of the table)…
      def hasV2Scan(sqlText: String): Boolean =
        spark.sql(sqlText).queryExecution.executedPlan.exists {
          case _: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => true
          case _ => false
        }
      assert(!hasV2Scan("SELECT k FROM sqldml_lift"),
        "a row-assembly snapshot must read through the lifted plan")
      // …and compact folds the MoR state away; reads RETURN to the V2
      // scan (pushdown/stats fast path)
      LakeTable.compact(spark, p)
      assert(hasV2Scan("SELECT k FROM sqldml_lift"),
        "a V2-servable snapshot must stay on the V2 scan")
      assert(spark.sql("SELECT count(*) AS n FROM sqldml_lift")
        .head.getLong(0) === 3L)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_lift")
  }

  test("table_changes TVF serves the change feed through SQL") {
    val p = "/tmp/graft_test/sqldml_tvf"
    freshTable(p, "sqldml_tvf")
    import spark.implicits._
    try {
      LakeTable.append(Seq((5L, "e", 50.0)).toDF("k", "s", "v"), p)
      LakeTable.delete(spark, p, col("k") === 2L)
      // SQL TVF ≡ library call, composed inside a SELECT
      val viaSql = spark.sql(
        s"SELECT change_type, k, s, v FROM table_changes('graftlake.`$p`', 0, 2) " +
          "ORDER BY change_type, k").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      val viaLib = LakeTable.changes(spark, p, 0, 2)
        .select("change_type", "k", "s", "v").orderBy("change_type", "k")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      assert(viaSql.toSeq === viaLib.toSeq)
      assert(viaSql.toSeq === Seq(("delete", 2L, "b", 20.0), ("insert", 5L, "e", 50.0)))
      // composes like any relation: aggregate over the TVF
      val agg = spark.sql(
        s"SELECT change_type, count(*) AS n FROM " +
          s"table_changes('graftlake.`$p`', 0, 2) GROUP BY 1 ORDER BY 1")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(agg === Seq(("delete", 1L), ("insert", 1L)))
      // the session-catalog NAME route resolves too
      assert(spark.sql(
        "SELECT count(*) AS n FROM table_changes('sqldml_tvf', 0, 2)")
        .head.getLong(0) === 2L)
      // 2-arg form defaults <to_version> to the table head
      assert(spark.sql(
        s"SELECT count(*) AS n FROM table_changes('graftlake.`$p`', 0)")
        .head.getLong(0) === 2L)
      // refusals: non-lake table; bad arity; lineage variant on a
      // table that does not track lineage
      val e1 = intercept[Exception](spark.sql(
        "SELECT * FROM table_changes('no_such_lake_tbl', 0, 1)").collect())
      assert(e1.getMessage.contains("not a lake table"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        s"SELECT * FROM table_changes('graftlake.`$p`')").collect())
      assert(e2.getMessage.contains("2 or 3 arguments"), e2.getMessage)
      val e3 = intercept[Exception](spark.sql(
        s"SELECT * FROM table_changes_with_lineage('graftlake.`$p`', 0, 2)")
        .collect())
      assert(e3.getMessage.contains("lineage"), e3.getMessage)
      // a timestamp endpoint resolves through the TIMESTAMP AS OF rule
      // (a future instant = the table head)
      assert(spark.sql("SELECT count(*) AS n FROM table_changes(" +
        s"'graftlake.`$p`', 0, '2100-01-01')").head.getLong(0) === 2L)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_tvf")
  }

  test("table_appends TVF serves the pure-append incremental scan through SQL") {
    val p = "/tmp/graft_test/sqldml_tvfa"
    rmdir(p)
    import spark.implicits._
    LakeTable.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), p) // v0
    LakeTable.append(Seq((3L, 30.0)).toDF("k", "v"), p) // v1
    LakeTable.append(Seq((4L, 40.0)).toDF("k", "v"), p) // v2
    // SQL TVF ≡ library call: exactly the appended rows, composable
    val viaSql = spark.sql(
      s"SELECT k, v FROM table_appends('graftlake.`$p`', 0, 2) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql === Seq((3L, 30.0), (4L, 40.0)))
    // 2-arg form defaults to the head
    assert(spark.sql(
      s"SELECT count(*) AS n FROM table_appends('graftlake.`$p`', 1)")
      .head.getLong(0) === 1L)
    // a non-append commit in range refuses BY NAME
    LakeTable.delete(spark, p, col("k") === 1L) // v3
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM table_appends('graftlake.`$p`', 0, 3)").collect())
    assert(e.getMessage.contains("v3=delete")
      && e.getMessage.contains("changes()"), e.getMessage)
    // the pre-delete range still serves
    assert(spark.sql(
      s"SELECT count(*) AS n FROM table_appends('graftlake.`$p`', 0, 2)")
      .head.getLong(0) === 2L)
  }

  test("table_changes_with_lineage TVF rides the row-lineage diff") {
    val p = "/tmp/graft_test/sqldml_tvfl"
    rmdir(p)
    import spark.implicits._
    LakeTable.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), p)
    LakeTable.enableRowLineage(spark, p)
    LakeTable.append(Seq((3L, 30.0)).toDF("k", "v"), p)
    val rows = spark.sql(
      s"SELECT change_type, k, v FROM " +
        s"table_changes_with_lineage('graftlake.`$p`', 1, 2) ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq(("insert", 3L, 30.0)), rows.toString)
  }

  test("composite ON key routes through write.merge.mode=merge-on-read") {
    val pM = "/tmp/graft_test/sqldml_mcomp_mor"
    val pC = "/tmp/graft_test/sqldml_mcomp_morcow"
    rmdir(pM); rmdir(pC)
    import spark.implicits._
    val rows = Seq(
      (1L, 1, "a", 10.0), (1L, 2, "b", 20.0), (2L, 1, "c", 30.0))
    for ((p, name) <- Seq(pM -> "sqldml_mcm", pC -> "sqldml_mcc")) {
      LakeTable.overwrite(rows.toDF("k1", "k2", "s", "v"), p)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name USING graftlake OPTIONS (path '$p')")
    }
    LakeTable.setTableProperties(spark, pM,
      Map("write.merge.mode" -> "merge-on-read"))
    Seq((1L, 1, "A", 100.0), (1L, 2, "B", 200.0), (3L, 1, "n", 99.0))
      .toDF("k1", "k2", "s", "v").createOrReplaceTempView("sqldml_mcm_src")
    try {
      for (name <- Seq("sqldml_mcm", "sqldml_mcc"))
        spark.sql(
          s"""MERGE INTO $name t USING sqldml_mcm_src u
            |ON t.k1 = u.k1 AND t.k2 = u.k2
            |WHEN MATCHED AND u.v >= 200.0 THEN DELETE
            |WHEN MATCHED THEN UPDATE SET s = u.s, v = u.v
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      def state(p: String) = LakeTable.read(spark, p).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
        .toSet
      assert(state(pM) === state(pC),
        "composite-key merge-on-read must equal the CoW twin")
      assert(state(pM) === Set(
        (1L, 1, "A", 100.0), (2L, 1, "c", 30.0), (3L, 1, "n", 99.0)))
      // the MoR route really shipped an equality delete, not a rewrite
      val ops = LakeTable.history(spark, pM).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(ops(2) === "mor_merge", ops.toString)
      // compact folds the two-column delete file away; content fixed
      LakeTable.compact(spark, pM)
      assert(state(pM) === state(pC), "compacted MoR content must not move")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sqldml_mcm")
      spark.sql("DROP TABLE IF EXISTS sqldml_mcc")
    }
  }

  test("DELETE WHERE <correlated scalar comparison> regroups onto the merge") {
    val p = "/tmp/graft_test/sqldml_cdel"
    freshTable(p, "sqldml_cdel")
    import spark.implicits._
    // per-key thresholds: k=1 -> 15, k=2 -> 25 (max of two), k=3/4 none
    Seq((1L, 15.0), (2L, 15.0), (2L, 25.0))
      .toDF("rk", "rv").createOrReplaceTempView("sqldml_cdel_ref")
    try {
      spark.sql("DELETE FROM sqldml_cdel t WHERE t.v < (SELECT max(r.rv) " +
        "FROM sqldml_cdel_ref r WHERE r.rk = t.k) AND t.s != 'z'")
      // k=1: 10 < 15 deletes; k=2: 20 < 25 deletes; k=3/4: no
      // reference row -> NULL threshold -> UNKNOWN -> kept
      assert(spark.sql("SELECT k FROM sqldml_cdel ORDER BY k").collect()
        .map(_.getLong(0)).toSeq === Seq(3L, 4L))
      assert(LakeTable.history(spark, p).count() === 2,
        "the correlated-scalar DELETE must be one commit")
      // a second subquery alongside refuses by name
      val e = intercept[Exception](spark.sql(
        "DELETE FROM sqldml_cdel t WHERE t.v < (SELECT max(r.rv) FROM " +
          "sqldml_cdel_ref r WHERE r.rk = t.k) AND t.k IN " +
          "(SELECT rk FROM sqldml_cdel_ref)"))
      assert(e.getMessage.contains("exactly ONE subquery"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_cdel")
  }

  test("UPDATE WHERE <correlated scalar comparison> gates a plain SET") {
    val p = "/tmp/graft_test/sqldml_cupd"
    freshTable(p, "sqldml_cupd")
    import spark.implicits._
    Seq((1L, 15.0), (2L, 15.0), (4L, 35.0))
      .toDF("rk", "rv").createOrReplaceTempView("sqldml_cupd_ref")
    try {
      spark.sql("UPDATE sqldml_cupd t SET s = 'low', v = v * 100 WHERE " +
        "t.v < (SELECT max(r.rv) FROM sqldml_cupd_ref r WHERE r.rk = t.k)")
      val rows = spark.sql("SELECT k, s, v FROM sqldml_cupd ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      // k=1: 10 < 15 updates; k=2: 20 < 15 false; k=3: no ref row ->
      // NULL -> UNKNOWN -> untouched; k=4: 40 < 35 false
      assert(rows === Seq((1L, "low", 1000.0), (2L, "b", 20.0),
        (3L, "c", 30.0), (4L, "d", 40.0)), rows.mkString(", "))
      // correlated WHERE + keyed WHERE refuses with both counts named
      val e = intercept[Exception](spark.sql(
        "UPDATE sqldml_cupd t SET s = 'x' WHERE t.v < (SELECT max(r.rv) " +
          "FROM sqldml_cupd_ref r WHERE r.rk = t.k) AND t.k IN " +
          "(SELECT rk FROM sqldml_cupd_ref)"))
      assert(e.getMessage.contains("exactly ONE subquery"), e.getMessage)
      // correlated SET + correlated WHERE refuses
      val e2 = intercept[Exception](spark.sql(
        "UPDATE sqldml_cupd t SET v = (SELECT max(r.rv) FROM sqldml_cupd_ref r " +
          "WHERE r.rk = t.k) WHERE t.v < (SELECT min(r.rv) FROM " +
          "sqldml_cupd_ref r WHERE r.rk = t.k)"))
      assert(e2.getMessage.contains("cannot combine"), e2.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_cupd")
  }

  test("uncorrelated scalar subqueries lower by value inside MERGE clauses") {
    val p = "/tmp/graft_test/sqldml_msc"
    freshTable(p, "sqldml_msc")
    import spark.implicits._
    Seq((2L, "B", 200.0), (9L, "I", 900.0)).toDF("k", "s", "v")
      .createOrReplaceTempView("sqldml_msc_src")
    Seq(25.0).toDF("x").createOrReplaceTempView("sqldml_msc_th")
    try {
      spark.sql(
        """MERGE INTO sqldml_msc t USING sqldml_msc_src u ON t.k = u.k
          |WHEN MATCHED AND t.v < (SELECT max(x) FROM sqldml_msc_th)
          |  THEN UPDATE SET v = u.v + (SELECT max(x) FROM sqldml_msc_th)
          |WHEN NOT MATCHED AND u.v > (SELECT min(x) FROM sqldml_msc_th)
          |  THEN INSERT *""".stripMargin)
      val rows = spark.sql("SELECT k, v FROM sqldml_msc ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // k=2 matched with t.v=20 < 25 -> v = 200 + 25; k=9 inserted
      assert(rows === Seq((1L, 10.0), (2L, 225.0), (3L, 30.0),
        (4L, 40.0), (9L, 900.0)), rows.mkString(", "))
      // a CORRELATED scalar inside a clause still refuses by name
      val e = intercept[Exception](spark.sql(
        """MERGE INTO sqldml_msc t USING sqldml_msc_src u ON t.k = u.k
          |WHEN MATCHED AND t.v < (SELECT max(x) FROM sqldml_msc_th
          |  WHERE x = t.v) THEN DELETE""".stripMargin))
      assert(e.getMessage.contains("only uncorrelated SCALAR"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_msc")
  }

  test("UPDATE SET <correlated scalar subquery> regroups onto the merge") {
    val p = "/tmp/graft_test/sqldml_corr"
    freshTable(p, "sqldml_corr")
    import spark.implicits._
    // per-key reference values: k=1 has two rows (max applies), k=3
    // has none (NULL arm), k=2 has one
    Seq((1L, 5.0), (1L, 9.0), (2L, 7.0), (4L, 100.0))
      .toDF("rk", "rv").createOrReplaceTempView("sqldml_corr_ref")
    try {
      spark.sql("UPDATE sqldml_corr t SET v = (SELECT max(r.rv) FROM " +
        "sqldml_corr_ref r WHERE r.rk = t.k), s = 'seen' WHERE t.k <= 3")
      val rows = spark.sql("SELECT k, s, v FROM sqldml_corr ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
      assert(rows === Seq(
        (1L, "seen", Some(9.0)),  // max of the two reference rows
        (2L, "seen", Some(7.0)),
        (3L, "seen", None),       // no reference row: SQL scalar-empty NULL
        (4L, "d", Some(40.0))),   // outside WHERE: untouched (k=4 ref ignored)
        rows.mkString(", "))
      // one commit for the whole statement
      assert(LakeTable.history(spark, p).count() === 2)
      // residual filter INSIDE the subquery applies before the regroup
      spark.sql("UPDATE sqldml_corr t SET v = (SELECT sum(r.rv) FROM " +
        "sqldml_corr_ref r WHERE r.rk = t.k AND r.rv > 6.0)")
      val v1 = spark.sql("SELECT v FROM sqldml_corr WHERE k = 1").head()
      assert(v1.getDouble(0) === 9.0, "rv=5.0 must be filtered before the sum")
      // refusals by name: two correlated SETs; correlated SET + keyed
      // WHERE; non-aggregate correlated scalar
      val e1 = intercept[Exception](spark.sql(
        "UPDATE sqldml_corr t SET v = (SELECT max(r.rv) FROM sqldml_corr_ref r " +
          "WHERE r.rk = t.k), s = (SELECT min(r.rv) FROM sqldml_corr_ref r " +
          "WHERE r.rk = t.k)"))
      assert(e1.getMessage.contains("exactly ONE correlated scalar"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        "UPDATE sqldml_corr t SET v = (SELECT max(r.rv) FROM sqldml_corr_ref r " +
          "WHERE r.rk = t.k) WHERE t.k IN (SELECT rk FROM sqldml_corr_ref)"))
      assert(e2.getMessage.contains("cannot combine"), e2.getMessage)
      val e3 = intercept[Exception](spark.sql(
        "UPDATE sqldml_corr t SET v = (SELECT r.rv FROM sqldml_corr_ref r " +
          "WHERE r.rk = t.k)"))
      assert(e3.getMessage.contains("AGGREGATE"), e3.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_corr")
  }

  test("correlated COUNT subqueries see 0, not NULL, on key-missing rows") {
    val p = "/tmp/graft_test/sqldml_ccnt"
    freshTable(p, "sqldml_ccnt")
    import spark.implicits._
    // reference rows only for k=1 (two) and k=2 (one); k=3/4 unkeyed
    Seq((1L, 5.0), (1L, 6.0), (2L, 7.0))
      .toDF("rk", "rv").createOrReplaceTempView("sqldml_ccnt_ref")
    try {
      // SET arm: a key the frame misses takes the empty-group 0 —
      // NULL here would silently blank every unkeyed row
      spark.sql("UPDATE sqldml_ccnt t SET v = (SELECT count(*) " +
        "FROM sqldml_ccnt_ref r WHERE r.rk = t.k)")
      val vs = spark.sql("SELECT k, v FROM sqldml_ccnt ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(vs === Seq((1L, 2.0), (2L, 1.0), (3L, 0.0), (4L, 0.0)),
        vs.mkString(", "))
      // WHERE arm: count()=0 must MATCH the unkeyed rows (a NULL
      // scalar would compare UNKNOWN and delete nothing)
      spark.sql("DELETE FROM sqldml_ccnt t WHERE (SELECT count(*) " +
        "FROM sqldml_ccnt_ref r WHERE r.rk = t.k) = 0")
      assert(spark.sql("SELECT k FROM sqldml_ccnt ORDER BY k").collect()
        .map(_.getLong(0)).toSeq === Seq(1L, 2L))
      // max/min/sum/avg keep SQL's NULL empty-group value: the same
      // comparison via max matches nothing (both survivors are keyed)
      spark.sql("DELETE FROM sqldml_ccnt t WHERE (SELECT max(r.rv) " +
        "FROM sqldml_ccnt_ref r WHERE r.rk = t.k) IS NOT NULL AND FALSE")
      assert(spark.sql("SELECT count(*) FROM sqldml_ccnt").collect()
        .head.getLong(0) === 2L)
      // a count buried in arithmetic refuses by name
      val e = intercept[Exception](spark.sql(
        "UPDATE sqldml_ccnt t SET v = (SELECT count(*) + 1 FROM " +
          "sqldml_ccnt_ref r WHERE r.rk = t.k)"))
      assert(e.getMessage.contains("WHOLE selected value"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_ccnt")
  }

  test("TRUNCATE TABLE commits metadata-only; non-lake tables fall through") {
    val p = "/tmp/graft_test/sqldml_truncate"
    freshTable(p, "sqldml_trunc")
    import spark.implicits._
    try {
      spark.sql("TRUNCATE TABLE sqldml_trunc")
      assert(spark.table("sqldml_trunc").count() === 0)
      val ops = LakeTable.history(spark, p).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(ops(ops.keys.max) === "truncate")
      // metadata-only: the pre-truncate snapshot time-travels complete
      assert(LakeTable.read(spark, p, Some(0)).count() === 4)
      // the table refills like any other
      LakeTable.append(Seq((7L, "g", 70.0)).toDF("k", "s", "v"), p)
      assert(spark.table("sqldml_trunc").count() === 1)
      // a NON-lake table keeps Spark's own TRUNCATE command
      spark.sql("DROP TABLE IF EXISTS sqldml_plain")
      spark.sql("CREATE TABLE sqldml_plain (i INT) USING parquet")
      spark.sql("INSERT INTO sqldml_plain VALUES (1), (2)")
      spark.sql("TRUNCATE TABLE sqldml_plain")
      assert(spark.table("sqldml_plain").count() === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS sqldml_trunc")
      spark.sql("DROP TABLE IF EXISTS sqldml_plain")
    }
  }

  test("SET/DROP IDENTIFIER FIELDS declare the key upsertByIdentity uses") {
    val p = "/tmp/graft_test/sqldml_idfields"
    freshTable(p, "sqldml_idf")
    import spark.implicits._
    try {
      // identifier fields are REQUIRED columns: no NOT NULL guard, no go
      val unguarded = intercept[Exception](
        spark.sql("ALTER TABLE sqldml_idf SET IDENTIFIER FIELDS k"))
      assert(unguarded.getMessage.contains("NOT NULL"))
      LakeTable.addConstraint(spark, p, "k_nn", "k IS NOT NULL")
      spark.sql("ALTER TABLE sqldml_idf SET IDENTIFIER FIELDS k")
      assert(LakeTable.identifierFieldsOf(p) === Seq("k"))
      val unknown = intercept[Exception](
        spark.sql("ALTER TABLE sqldml_idf SET IDENTIFIER FIELDS nope"))
      assert(unknown.getMessage.contains("not a table column"))
      // the TABLE supplies the key: update k=2, insert k=9
      LakeTable.upsertByIdentity(
        Seq((2L, "B", 200.0), (9L, "z", 9.0)).toDF("k", "s", "v"), p)
      val rows = spark.sql("SELECT k, s, v FROM sqldml_idf ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rows === Seq((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0),
        (4L, "d", 40.0), (9L, "z", 9.0)))
      // a NULL-keyed batch violates the declaration's contract
      val nullKeyed = intercept[IllegalArgumentException](
        LakeTable.upsertByIdentity(
          Seq(("x", 1.0)).toDF("s", "v")
            .withColumn("k", lit(null).cast("long")), p))
      assert(nullKeyed.getMessage.contains("NULL"))
      // write.merge.mode routes the identity upsert onto the MoR writer
      LakeTable.setTableProperties(spark, p,
        Map("write.merge.mode" -> "merge-on-read"))
      LakeTable.upsertByIdentity(Seq((9L, "Z", 90.0)).toDF("k", "s", "v"), p)
      val ops = LakeTable.history(spark, p).collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(ops(ops.keys.max) === "mor_merge")
      assert(spark.sql("SELECT s FROM sqldml_idf WHERE k = 9").collect()
        .map(_.getString(0)).toSeq === Seq("Z"))
      spark.sql("ALTER TABLE sqldml_idf DROP IDENTIFIER FIELDS k")
      assert(LakeTable.identifierFieldsOf(p).isEmpty)
      val undeclared = intercept[IllegalArgumentException](
        LakeTable.upsertByIdentity(Seq((1L, "x", 1.0)).toDF("k", "s", "v"), p))
      assert(undeclared.getMessage.contains("no identifier fields declared"))
    } finally spark.sql("DROP TABLE IF EXISTS sqldml_idf")
  }

  test("identity upserts re-check the NOT NULL guard: a rollback past it refuses") {
    // the declaration file lives OUTSIDE the versioned commit plane —
    // a rollback that strips the guard constraint must not leave a
    // declared key whose required-column invariant silently no longer
    // holds (round-14 ADVICE)
    val p = "/tmp/graft_test/sqldml_idf_rollback"
    rmdir(p)
    import spark.implicits._
    LakeTable.overwrite(Seq((1L, "a", 10.0)).toDF("k", "s", "v"), p) // v0
    LakeTable.addConstraint(spark, p, "k_nn", "k IS NOT NULL") // v1
    LakeTable.setIdentifierFields(p, Seq("k"))
    LakeTable.upsertByIdentity(Seq((2L, "b", 20.0)).toDF("k", "s", "v"), p) // v2
    LakeTable.rollback(spark, p, 0) // strips the k_nn constraint
    val stripped = intercept[IllegalArgumentException](
      LakeTable.upsertByIdentity(Seq((3L, "c", 30.0)).toDF("k", "s", "v"), p))
    assert(stripped.getMessage.contains("NOT NULL guard"), stripped.getMessage)
    val cdc = intercept[IllegalArgumentException](
      graft.sources.CdcApply.applyChangesByIdentity(
        Seq((3L, "c", 1L, "insert")).toDF("k", "s", "_seq", "change_type"),
        p, "_seq"))
    assert(cdc.getMessage.contains("NOT NULL guard"), cdc.getMessage)
    // re-adding the guard restores the green path
    LakeTable.addConstraint(spark, p, "k_nn2", "k IS NOT NULL")
    LakeTable.upsertByIdentity(Seq((3L, "c", 30.0)).toDF("k", "s", "v"), p)
    assert(LakeTable.read(spark, p).count() === 2L) // v0 row + the upsert
  }
}
