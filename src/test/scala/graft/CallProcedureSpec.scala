package graft

import graft.sources.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-style `CALL cat.system.<proc>(…)` through Spark 4's native
  * ProcedureCatalog route: stock grammar, analyzer-bound named args,
  * declared defaults, LocalScan results. */
class CallProcedureSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val wh = "/tmp/graft_test/callproc_wh"

  private def withCat[A](body: => A): A = {
    spark.conf.set("spark.sql.catalog.callc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.callc.warehouse", wh)
    try body
    finally {
      spark.conf.unset("spark.sql.catalog.callc")
      spark.conf.unset("spark.sql.catalog.callc.warehouse")
    }
  }

  test("rewrite_data_files binpacks; expire_snapshots + remove_orphan_files GC") {
    SparkSpec.rmdir(wh)
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      spark.sql("CREATE TABLE callc.db.t (k BIGINT, v DOUBLE) USING graftlake")
      (0 until 3).foreach { g =>
        spark.sql(s"INSERT INTO callc.db.t SELECT id, id * 1.0 FROM range(${g * 100}, ${g * 100 + 100})")
      }
      val p = s"$wh/db/t"
      val filesBefore = LakeTable.entriesOf(p, LakeTable.latestVersion(p).get).size
      val out = spark.sql(
        "CALL callc.system.rewrite_data_files(table => 'db.t')").collect()
      assert(out.length == 1 && out.head.getInt(0) > 0)
      val filesAfter = LakeTable.entriesOf(p, LakeTable.latestVersion(p).get).size
      assert(filesAfter < filesBefore, s"binpack must fold: $filesBefore -> $filesAfter")
      assert(spark.table("callc.db.t").count() === 300)
      // positional arg form works too (Spark binds by position)
      spark.sql("CALL callc.system.expire_snapshots('db.t', retain_last => 1)")
      val live = (0 to LakeTable.latestVersion(p).get).count(v =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p/_graft_meta/v$v")))
      assert(live === 1, s"retain_last => 1 must leave one live version, got $live")
      val orphans = spark.sql(
        "CALL callc.system.remove_orphan_files(table => 'db.t')").head.getLong(0)
      assert(orphans >= 0L)
      assert(spark.table("callc.db.t").count() === 300)
    }
  }

  test("rollback_to_snapshot and compute_table_stats route to the library") {
    SparkSpec.rmdir(wh)
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      spark.sql("CREATE TABLE callc.db.r (k BIGINT) USING graftlake")
      spark.sql("INSERT INTO callc.db.r VALUES (1), (2)") // v1
      spark.sql("INSERT INTO callc.db.r VALUES (3)") // v2
      spark.sql("CALL callc.system.rollback_to_snapshot(table => 'db.r', version => 1)")
      assert(spark.table("callc.db.r").count() === 2)
      val p = s"$wh/db/r"
      spark.sql("CALL callc.system.compute_table_stats(table => 'db.r')")
      assert(LakeTable.approxCountDistinct(spark, p, "k") === 2L,
        "ANALYZE via CALL must attach NDV sketches")
    }
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE ride listProcedures for free") {
    SparkSpec.rmdir(wh)
    withCat {
      val names = spark.sql("SHOW PROCEDURES IN callc.system").collect()
        .map(_.getAs[String]("procedure_name")).toSet
      assert(names === Set("expire_snapshots", "remove_orphan_files",
        "rewrite_data_files", "rewrite_position_delete_files",
        "rewrite_manifests", "convert_equality_deletes",
        "refresh_materialized_view", "add_files",
        "rollback_to_snapshot", "rollback_to_timestamp",
        "fast_forward", "cherrypick_snapshot", "compute_table_stats",
        "ancestors_of", "snapshot", "migrate", "register_table"))
      val desc = spark.sql("DESCRIBE PROCEDURE callc.system.expire_snapshots")
        .collect().map(_.getString(0)).mkString(" ")
      assert(desc.contains("expire_snapshots") && desc.contains("retain_last"))
    }
  }

  test("rewrite_data_files where-scope folds only in-scope files; bad predicates refuse") {
    SparkSpec.rmdir(wh)
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      spark.sql("CREATE TABLE callc.db.f (k BIGINT, v DOUBLE) USING graftlake")
      val p = s"$wh/db/f"
      // three inserts with disjoint key ranges → three files with
      // disjoint stats boxes
      spark.sql("INSERT INTO callc.db.f SELECT id, CAST(id AS DOUBLE) FROM range(0, 100, 1, 1)")
      spark.sql("INSERT INTO callc.db.f SELECT id, CAST(id AS DOUBLE) FROM range(100, 200, 1, 1)")
      spark.sql("INSERT INTO callc.db.f SELECT id, CAST(id AS DOUBLE) FROM range(200, 300, 1, 1)")
      def files() = LakeTable.entries(spark, p)
        .filter(col("kind") === "data")
        .select("file").collect().map(_.getString(0)).toSet
      val before = files()
      assert(before.size >= 3)
      // BETWEEN parses to the >=/<= pair; only the 0..199 files fold
      spark.sql("CALL callc.system.rewrite_data_files(table => 'db.f', " +
        "where => 'k BETWEEN 0 AND 199')")
      val after = files()
      val carried = before.intersect(after)
      assert(carried.nonEmpty, "the out-of-scope files must carry")
      // carried = exactly the files outside the scope: every row they
      // hold has k >= 200 (file selection was stats-exact here)
      val carriedKs = spark.read.parquet(carried.toSeq: _*)
        .select("k").collect().map(_.getLong(0))
      assert(carriedKs.nonEmpty && carriedKs.forall(_ >= 200L),
        "carried files must be exactly the out-of-scope ones")
      assert(after.size === carried.size + 1,
        s"the in-scope files fold into one: $after")
      assert(spark.table("callc.db.f").count() === 300,
        "file selection never changes row visibility")
      // a predicate the stats planes cannot serve refuses by name
      val e = intercept[Exception](spark.sql(
        "CALL callc.system.rewrite_data_files(table => 'db.f', " +
          "where => 'v LIKE \\'x%\\'')").collect())
      assert(e.getMessage.contains("unsupported predicate"), e.getMessage)
    }
  }

  test("rewrite_data_files(strategy => 'sort') restores skipping parity for a late-declared order") {
    SparkSpec.rmdir(wh)
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      spark.sql("CREATE TABLE callc.db.s (k BIGINT, v DOUBLE) USING graftlake")
      val p = s"$wh/db/s"
      // round-robin landing: every file spans the full k range —
      // nothing skippable (the S8q baseline shape)
      LakeTable.append(
        spark.range(0, 400).select(col("id").as("k"), (col("id") * 2.0).as("v"))
          .repartition(4), p)
      assert(LakeTable.readWhereBetween(spark, p, "k", 0, 50).count() === 51)
      val loose = LakeTable.lastPlanAudit
      assert(loose.filesKept === loose.filesClaimed,
        s"round-robin files must be unprunable: $loose")
      // no declared order → the sort strategy refuses by name
      val e = intercept[Exception](spark.sql(
        "CALL callc.system.rewrite_data_files(table => 'db.s', strategy => 'sort')"))
      assert(e.getMessage.contains("no declared sort order"), e.getMessage)
      // declare the order AFTER the data landed (metadata-only), then
      // the one-call remedy re-sorts the landed files
      LakeTable.setSortOrder(p, "k")
      val out = spark.sql(
        "CALL callc.system.rewrite_data_files(table => 'db.s', strategy => 'sort')")
        .collect()
      assert(out.length == 1 && out.head.getInt(0) > 0)
      assert(spark.table("callc.db.s").count() === 400)
      // skipping parity with what a declared-order append would give
      assert(LakeTable.readWhereBetween(spark, p, "k", 0, 50).count() === 51)
      val sorted = LakeTable.lastPlanAudit
      assert(sorted.filesKept < sorted.filesClaimed && sorted.filesKept === 1,
        s"post-rewrite skipping must match declared-order appends: $sorted")
      assert(LakeTable.operationOf(p, LakeTable.latestVersion(p).get) === "optimize")
      // an unknown strategy refuses by name; the binpack knob refuses
      // under the sort strategy
      val e2 = intercept[Exception](spark.sql(
        "CALL callc.system.rewrite_data_files(table => 'db.s', strategy => 'cluster')"))
      assert(e2.getMessage.contains("unknown strategy"), e2.getMessage)
      val e3 = intercept[Exception](spark.sql(
        "CALL callc.system.rewrite_data_files(table => 'db.s', " +
          "strategy => 'sort', target_file_size_bytes => 1024)"))
      assert(e3.getMessage.contains("binpack knob"), e3.getMessage)
    }
  }

  test("add_files imports metadata-only through the CALL route") {
    SparkSpec.rmdir(wh)
    SparkSpec.rmdir("/tmp/graft_test/callproc_addf")
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      spark.sql("CREATE TABLE callc.db.a (k BIGINT, v DOUBLE) USING graftlake")
      spark.sql("INSERT INTO callc.db.a SELECT id, id * 1.0 FROM range(0, 40)")
      spark.range(40, 70)
        .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .write.parquet("/tmp/graft_test/callproc_addf")
      val out = spark.sql(
        "CALL callc.system.add_files(table => 'db.a', " +
          "source_dir => '/tmp/graft_test/callproc_addf')").head
      assert(out.getInt(0) === 2, "import publishes v2 (create=v0, insert=v1)")
      assert(out.getLong(1) > 0L, "files_added must count the import")
      assert(spark.table("callc.db.a").count() === 70,
        "the DSv2 table route reads the imported rows")
      // in-place listing proof rides the library read (the DSv2
      // wrapper scan is not a FileScan, so Dataset.inputFiles is
      // empty there by Spark's own contract)
      assert(LakeTable.read(spark, s"$wh/db/a").inputFiles
        .exists(_.contains("callproc_addf")), "scan lists imports in place")
    }
  }

  test("arg-less expire_snapshots reads the table's own retention policy") {
    SparkSpec.rmdir(wh)
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      spark.sql("CREATE TABLE callc.db.e (k BIGINT) USING graftlake")
      spark.sql("INSERT INTO callc.db.e VALUES (1)")
      spark.sql("INSERT INTO callc.db.e VALUES (2)")
      // no policy, no args → refuses naming the policy keys
      val e = intercept[Exception](spark.sql(
        "CALL callc.system.expire_snapshots(table => 'db.e')").collect())
      assert(e.getMessage.contains("history.expire"), e.getMessage)
      // the policy is a versioned property; the arg-less CALL applies it
      spark.sql("ALTER TABLE callc.db.e SET TBLPROPERTIES " +
        "('history.expire.min-snapshots-to-keep' = '1')")
      spark.sql("CALL callc.system.expire_snapshots(table => 'db.e')")
      val p = s"$wh/db/e"
      val live = (0 to LakeTable.latestVersion(p).get).count(v =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p/_graft_meta/v$v")))
      assert(live === 1, s"policy retain=1 must leave one live version, got $live")
      assert(spark.table("callc.db.e").count() === 2)
    }
  }

  test("unknown procedure and non-lake table refuse loudly") {
    SparkSpec.rmdir(wh)
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      val e1 = intercept[Exception](
        spark.sql("CALL callc.system.frobnicate(table => 'db.t')"))
      // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE;
      // the supported-procedure list rides the cause chain
      val msgs = Iterator.iterate[Throwable](e1)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("supported") || msgs.contains("Failed to load routine"),
        msgs)
      spark.sql("CREATE TABLE callc.db.ok (k BIGINT) USING graftlake")
      val e2 = intercept[Exception](
        spark.sql("CALL callc.system.rewrite_data_files(table => 'db.nope')")
          .collect())
      assert(e2.getMessage.contains("not a lake table"), e2.getMessage)
    }
  }

  test("snapshot creates a zero-copy trial table that refuses GC") {
    SparkSpec.rmdir(wh)
    SparkSpec.rmdir("/tmp/graft_test/callproc_snapsrc")
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      val src = "/tmp/graft_test/callproc_snapsrc"
      (1L to 50L).map(i => (i, i * 2.0)).toDF("k", "v")
        .write.mode("overwrite").parquet(src)
      val out = spark.sql(
        s"CALL callc.system.snapshot(source_dir => '$src', table => 'db.snap')")
        .collect()
      assert(out.length === 1)
      val p = out.head.getString(1)
      // zero copy: the live entries point INTO the source dir
      assert(LakeTable.entriesOf(p, LakeTable.latestVersion(p).get)
        .filter(_.kind == "data").forall(_.file.startsWith(src)))
      assert(spark.table("callc.db.snap").count() === 50L)
      // the trial table is writable...
      spark.sql("INSERT INTO callc.db.snap VALUES (99, 0.5)")
      assert(spark.table("callc.db.snap").count() === 51L)
      // ...but every file-deleting maintenance op refuses by name
      for (call <- Seq(
        "CALL callc.system.expire_snapshots(table => 'db.snap', retain_last => 1)",
        "CALL callc.system.remove_orphan_files(table => 'db.snap')")) {
        val e = intercept[Exception](spark.sql(call).collect())
        assert(e.getMessage.contains("gc.enabled"), s"$call: ${e.getMessage}")
      }
      // the source files really survived
      assert(spark.read.parquet(src).count() === 50L)
    }
  }

  test("migrate converts an EXTERNAL parquet table in place; MANAGED refuses") {
    SparkSpec.rmdir(wh)
    SparkSpec.rmdir("/tmp/graft_test/callproc_migsrc")
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      val src = "/tmp/graft_test/callproc_migsrc"
      (1L to 40L).map(i => (i, s"s$i")).toDF("k", "s")
        .write.mode("overwrite").parquet(src)
      spark.sql("DROP TABLE IF EXISTS callproc_mig_ext")
      spark.sql("CREATE TABLE callproc_mig_ext (k BIGINT, s STRING) " +
        s"USING parquet LOCATION '$src'")
      val out = spark.sql("CALL callc.system.migrate(" +
        "source_table => 'callproc_mig_ext', table => 'db.mig')").collect()
      assert(out.length === 1)
      val p = out.head.getString(1)
      // in place: entries point into the source dir; files survived
      assert(LakeTable.entriesOf(p, LakeTable.latestVersion(p).get)
        .filter(_.kind == "data").forall(_.file.startsWith(src)))
      assert(spark.table("callc.db.mig").count() === 40L)
      // the source REGISTRATION is gone (files are not)
      assert(!spark.catalog.tableExists("callproc_mig_ext"))
      assert(spark.read.parquet(src).count() === 40L)
      // ownership transferred: GC is allowed on the migrated table
      spark.sql("INSERT INTO callc.db.mig VALUES (99, 'x')")
      spark.sql("CALL callc.system.expire_snapshots(table => 'db.mig', " +
        "retain_last => 1)")
      assert(spark.table("callc.db.mig").count() === 41L)
      // a MANAGED source refuses by name
      spark.sql("DROP TABLE IF EXISTS callproc_mig_managed")
      (1L to 3L).toDF("k").write.saveAsTable("callproc_mig_managed")
      try {
        val e = intercept[Exception](spark.sql("CALL callc.system.migrate(" +
          "source_table => 'callproc_mig_managed', table => 'db.mig2')")
          .collect())
        assert(e.getMessage.contains("MANAGED"), e.getMessage)
      } finally spark.sql("DROP TABLE IF EXISTS callproc_mig_managed")
    }
  }

  test("register_table refuses in path mode with the HadoopCatalog posture") {
    SparkSpec.rmdir(wh)
    withCat {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS callc.db")
      val ext = "/tmp/graft_test/callproc_regsrc"
      SparkSpec.rmdir(ext)
      LakeTable.overwrite(Seq((1L, 1.0)).toDF("k", "v"), ext)
      val e = intercept[Exception](spark.sql("CALL callc.system.register_table(" +
        s"table => 'db.reg', metadata_location => '$ext')").collect())
      assert(e.getMessage.contains("indirection"), e.getMessage)
    }
  }
}
