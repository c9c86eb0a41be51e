package graft

import graft.sources.LakeTable
import graft.sources.LakeTable.PartitionTransform
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MoR-aware METADATA PLANE (round-10, verdict "missing" #1):
  * position deletes and deletion vectors are per-file row indexes, so
  * their counts subtract EXACTLY from manifest metadata — `partitions`
  * and the count(*) metadata pushdowns stay available through MoR
  * ingest; only equality deletes (key-granular, per-file match counts
  * unknowable) still refuse. */
class MorMetadataSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def mkPartitioned(p: String): Unit = {
    SparkSpec.rmdir(p)
    val df = (0 until 300)
      .map(i => (i.toLong, (i % 3).toLong, i * 1.0)).toDF("k", "day", "v")
    LakeTable.overwriteHiddenPartitioned(
      df, p, Seq(PartitionTransform("day", "identity")))
  }

  test("partitions subtracts position deletes exactly, per partition") {
    val p = "/tmp/graft_test/mormeta_pos"
    mkPartitioned(p)
    // delete 10 rows of day 0 and 5 of day 1, row-granular
    LakeTable.deleteMoRPositional(spark, p,
      (col("day") === 0L && col("k") < 30L) ||
        (col("day") === 1L && col("k") < 16L))
    val rollup = LakeTable.partitions(spark, p).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ground truth from the assembled read
    val truth = LakeTable.read(spark, p).groupBy("day").count().collect()
      .map(r => s"identity_day=${r.getLong(0)}" -> r.getLong(1)).toMap
    assert(rollup === truth, s"rollup $rollup must equal read-side $truth")
    assert(rollup("identity_day=0") === 90L && rollup("identity_day=1") === 95L)
  }

  test("partitions subtracts DV deletes; overlapping posdel+DV never double-count") {
    val p = "/tmp/graft_test/mormeta_dv"
    mkPartitioned(p)
    LakeTable.deleteMoRVector(spark, p, col("k") < 30L) // 10 per day
    val afterDv = LakeTable.partitions(spark, p).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterDv.values.sum === 270L, s"300 - 30 deleted: $afterDv")
    // a second, posdel-shaped delete over the VISIBLE state — plus a
    // hand-staged overlap would be invisible anyway because the
    // union-popcount folds both representations into one bitmap
    LakeTable.deleteMoRPositional(spark, p, col("k") >= 290L)
    val both = LakeTable.partitions(spark, p).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(both.values.sum === 260L, s"270 - 10 more: $both")
    val truth = LakeTable.read(spark, p).count()
    assert(both.values.sum === truth)
  }

  test("equality deletes still refuse the rollup; compact lifts it") {
    val p = "/tmp/graft_test/mormeta_eq"
    mkPartitioned(p)
    LakeTable.deleteMoR(spark, p, "k", col("k") < 10L)
    val e = intercept[Exception](LakeTable.partitions(spark, p).collect())
    assert(e.getMessage.contains("EQUALITY") && e.getMessage.contains("compact"))
    LakeTable.compact(spark, p)
    assert(LakeTable.partitions(spark, p)
      .agg(sum("record_count")).head.getLong(0) === 290L)
  }

  test("convertEqualityDeletes retires equality files and restores the plane, zero data rewritten") {
    val p = "/tmp/graft_test/mormeta_convert"
    mkPartitioned(p)
    // layered deletes: row-granular first, then an equality delete
    // over the VISIBLE state (k=5 is already pos-deleted, so it
    // contributes no key), then fresh data RE-landing a deleted key
    // (the seq rule: the retired delete must not touch the re-land)
    LakeTable.deleteMoRPositional(spark, p, col("k") < 10L)
    LakeTable.deleteMoR(spark, p, "k", col("k") >= 290L || col("k") === 5L)
    LakeTable.append(Seq((295L, 1L, -1.0)).toDF("k", "day", "v"), p)
    val v0 = LakeTable.latestVersion(p).get
    val before = LakeTable.read(spark, p).collect().toSet
    assert(before.size === 281) // 300 - 10 pos - 10 eq + 1 re-land
    // pre-convert: the plane refuses BY NAME
    val e = intercept[Exception](LakeTable.partitions(spark, p).collect())
    assert(e.getMessage.contains("EQUALITY"), e.getMessage)
    val dataBefore = LakeTable.entriesOf(p, v0)
      .filter(_.kind == "data").map(_.file).toSet
    LakeTable.convertEqualityDeletes(spark, p)
    val v1 = LakeTable.latestVersion(p).get
    val kinds = LakeTable.entriesOf(p, v1).map(_.kind).toSet
    assert(!kinds("delete"), s"equality manifests must retire, got $kinds")
    assert(LakeTable.entriesOf(p, v1).filter(_.kind == "data").map(_.file).toSet
      === dataBefore, "conversion must not rewrite a single data file")
    // read semantics identical, including the re-landed key
    assert(LakeTable.read(spark, p).collect().toSet === before)
    assert(LakeTable.read(spark, p).filter(col("k") === 295L).count() === 1L)
    // the metadata plane serves again, exactly
    assert(LakeTable.partitions(spark, p)
      .agg(sum("record_count")).head.getLong(0) === 281L)
    // time travel to the pre-convert version still applies the
    // equality semantics (history untouched)
    assert(LakeTable.read(spark, p, Some(v0)).collect().toSet === before)
    // idempotent: a second call is a pure carry-forward
    LakeTable.convertEqualityDeletes(spark, p)
    assert(LakeTable.read(spark, p).collect().toSet === before)
    // CALL surface routes onto the same machinery
    spark.conf.set("spark.sql.catalog.ceqc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ceqc.warehouse", "/tmp/graft_test/ceq_wh")
    try {
      val out = spark.sql(
        s"CALL ceqc.system.convert_equality_deletes(table => '$p')").collect()
      assert(out.length === 1)
    } finally {
      spark.conf.unset("spark.sql.catalog.ceqc")
      spark.conf.unset("spark.sql.catalog.ceqc.warehouse")
    }
  }

  test("composite-key MoR MERGE ships an n-column equality delete; convert retires it") {
    val p = "/tmp/graft_test/mormeta_comp"
    SparkSpec.rmdir(p)
    // composite business key (k1, k2): k1 repeats across k2 — a
    // single-key delete file could not express the tuple match
    val df = (0 until 60)
      .map(i => ((i / 4).toLong, i % 4, i * 1.0)).toDF("k1", "k2", "v")
    LakeTable.overwrite(df, p)
    val src = Seq(
      (1L, 0, 1000.0),  // matched tuple: update
      (1L, 1, -1.0),    // matched tuple: delete (v < 0 clause)
      (99L, 0, 9.0))    // unmatched tuple: insert
      .toDF("k1", "k2", "v")
    LakeTable.mergeConditionalMoRKeys(src, p, Seq("k1", "k2"),
      matched = Seq(
        LakeTable.MatchedDelete(Some(col("s.v") < 0)),
        LakeTable.MatchedUpdate(None, Map("v" -> col("s.v")))),
      notMatchedInsert = Some(lit(true)))
    val v0 = LakeTable.latestVersion(p).get
    assert(LakeTable.history(spark, p).collect().map(_.getString(1)).toSeq
      === Seq("overwrite", "mor_merge"))
    // the delete file carries BOTH key columns
    val delRef = LakeTable.entriesOf(p, v0).filter(_.kind == "delete")
    assert(delRef.nonEmpty)
    val delCols = spark.read.parquet(delRef.map(_.file): _*).columns.toSet
    assert(delCols === Set("k1", "k2"), delCols.toString)
    // tuple semantics: (1,0) updated, (1,1) gone, (1,2)/(1,3) kept
    // untouched (same k1, different k2 — a single-key delete would
    // have killed them), (99,0) inserted
    def rows() = LakeTable.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val base: Set[(Long, Int, Double)] = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val expect = base
      .filterNot(t => t._1 == 1L && (t._2 == 0 || t._2 == 1)) +
      ((1L, 0, 1000.0)) + ((99L, 0, 9.0))
    assert(rows() === expect)
    // convert folds the n-column equality file to DVs, zero data
    // rewritten; the metadata plane serves again
    val dataBefore = LakeTable.entriesOf(p, v0)
      .filter(_.kind == "data").map(_.file).toSet
    LakeTable.convertEqualityDeletes(spark, p)
    val v1 = LakeTable.latestVersion(p).get
    assert(!LakeTable.entriesOf(p, v1).exists(_.kind == "delete"))
    assert(LakeTable.entriesOf(p, v1).filter(_.kind == "data").map(_.file).toSet
      === dataBefore, "conversion must not rewrite a single data file")
    assert(rows() === expect, "conversion must not move a row")
    // composite-key MoR DELETE and UPSERT ride the same n-column
    // delete-file format: tuple-granular subtraction, seq-ruled
    LakeTable.deleteMoRKeys(spark, p, Seq("k1", "k2"),
      col("k1") === 2L && col("k2") === 3)
    assert(!rows().exists(t => t._1 == 2L && t._2 == 3),
      "the composite delete must remove exactly the (2,3) tuple")
    assert(rows().count(_._1 == 2L) === 3, "other k2 of k1=2 must survive")
    LakeTable.upsertMoRKeys(
      Seq((3L, 0, -30.0), (98L, 5, 8.0)).toDF("k1", "k2", "v"), p,
      Seq("k1", "k2"))
    assert(rows().exists(t => t == ((3L, 0, -30.0))), "upsert must replace (3,0)")
    assert(rows().count(_._1 == 3L) === 4, "the other k2 of k1=3 survive")
    assert(rows().exists(t => t == ((98L, 5, 8.0))), "new tuple must insert")
    // fold the composite deletes away so the mixed-list refusal below
    // starts from a clean slate (the merge's own read must not trip it)
    LakeTable.convertEqualityDeletes(spark, p)
    // mixed key LISTS across delete commits refuse loudly at read
    LakeTable.deleteMoR(spark, p, "k1", col("k1") === 0L)
    LakeTable.mergeConditionalMoRKeys(
      Seq((2L, 0, 5.0)).toDF("k1", "k2", "v"), p, Seq("k1", "k2"),
      matched = Seq(LakeTable.MatchedUpdate(None, Map("v" -> col("s.v")))))
    val e = intercept[Exception](LakeTable.read(spark, p).collect())
    assert(e.getMessage.contains("ONE key column list"), e.getMessage)
  }

  test("rewritePositionDeletes consolidates the delete representation, zero data rewritten") {
    val p = "/tmp/graft_test/mormeta_rewrite"
    mkPartitioned(p)
    LakeTable.deleteMoRPositional(spark, p, col("k") < 10L)
    LakeTable.deleteMoRPositional(spark, p, col("k") >= 290L)
    LakeTable.deleteMoRVector(spark, p, col("k") === 150L)
    val v0 = LakeTable.latestVersion(p).get
    val dataBefore = LakeTable.entriesOf(p, v0)
      .filter(_.kind == "data").map(_.file).toSet
    def rowDeletes(v: Int) = LakeTable.entriesOf(p, v)
      .count(e => e.kind == "posdel" || e.kind == "dv")
    assert(rowDeletes(v0) >= 3, "three delete files accumulated")
    LakeTable.rewritePositionDeletes(spark, p)
    val v1 = LakeTable.latestVersion(p).get
    assert(LakeTable.entriesOf(p, v1).filter(_.kind == "data").map(_.file).toSet
      === dataBefore, "consolidation must not touch a single data file")
    val dvAfter = LakeTable.entriesOf(p, v1).filter(_.kind == "dv")
    assert(rowDeletes(v1) < rowDeletes(v0) && dvAfter.nonEmpty,
      s"delete files must fold: ${rowDeletes(v0)} -> ${rowDeletes(v1)}")
    // read semantics identical before and after
    assert(LakeTable.read(spark, p, Some(v1)).count() === 279)
    assert(LakeTable.read(spark, p, Some(v1)).collect().toSet
      === LakeTable.read(spark, p, Some(v0)).collect().toSet)
    // the metadata plane keeps subtracting exactly through the new vector
    assert(LakeTable.partitions(spark, p)
      .agg(sum("record_count")).head.getLong(0) === 279L)
    // CALL surface routes to it
    spark.conf.set("spark.sql.catalog.rpdc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rpdc.warehouse", "/tmp/graft_test/rpd_wh")
    try {
      val out = spark.sql(
        s"CALL rpdc.system.rewrite_position_delete_files(table => '$p')").collect()
      assert(out.length === 1) // idempotent-ish: single dv manifest → carry-forward
    } finally {
      spark.conf.unset("spark.sql.catalog.rpdc")
      spark.conf.unset("spark.sql.catalog.rpdc.warehouse")
    }
  }

  test("count(*) metadata pushdown answers through pos/DV deletes; min/max refuse") {
    val wh = "/tmp/graft_test/mormeta_cat"
    SparkSpec.rmdir(wh)
    spark.conf.set("spark.sql.catalog.morc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.morc.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS morc.db")
      spark.sql("CREATE TABLE morc.db.t (k BIGINT, v DOUBLE) USING graftlake")
      spark.sql("INSERT INTO morc.db.t SELECT id, id * 1.0 FROM range(0, 500)")
      val p = s"$wh/db/t"
      LakeTable.deleteMoRPositional(spark, p, col("k") < 40L)
      LakeTable.deleteMoRVector(spark, p, col("k") >= 480L)
      // count(*) stays METADATA-ONLY under posdel/DV state: the
      // read-lift rule defers to the V2 aggregate pushdown here, so
      // the plan must contain NO data scan at all — with the 60
      // deleted rows subtracted exactly
      val cdf = spark.sql("SELECT count(*) FROM morc.db.t")
      assert(cdf.head.getLong(0) === 440L)
      assert(!cdf.queryExecution.executedPlan.exists {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case _: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => true
        case _ => false
      }, "a posdel/DV count must answer from manifest metadata, not a scan")
      // min/max cannot come from metadata (an extremal row may be
      // deleted) — the round-14 read-lift serves them through the
      // library plan instead of the old "compact first" refusal
      assert(spark.sql("SELECT min(k) AS m FROM morc.db.t").head.getLong(0)
        === 40L, "min must serve through the lifted read")
    } finally {
      spark.conf.unset("spark.sql.catalog.morc")
      spark.conf.unset("spark.sql.catalog.morc.warehouse")
    }
  }

  test("GROUP BY count(*) pushdown subtracts per group through posdel") {
    val p = "/tmp/graft_test/mormeta_group"
    mkPartitioned(p)
    LakeTable.deleteMoRPositional(spark, p, col("day") === 2L && col("k") < 60L)
    val groups = LakeTable.metadataGroupAggregate(
      spark, p, LakeTable.latestVersion(p).get, Seq("day"),
      minCols = Nil, maxCols = Nil, needCount = true)
    assert(groups.isDefined, "count-only group pushdown must answer under posdel")
    val counts = groups.get.map(g => g.key.head -> g.count.get).toMap
    assert(counts === Map(0L -> 100L, 1L -> 100L, 2L -> 80L), s"$counts")
    // min/max refuse under MoR
    assert(LakeTable.metadataGroupAggregate(
      spark, p, LakeTable.latestVersion(p).get, Seq("day"),
      minCols = Seq("v"), maxCols = Nil, needCount = true).isEmpty)
  }

  test("position_deletes lists every suppressed position, both representations") {
    val p = "/tmp/graft_test/mormeta_pdt"
    SparkSpec.rmdir(p)
    LakeTable.overwrite(
      (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
        .repartition(1).sortWithinPartitions("k"), p)
    LakeTable.deleteMoRPositional(spark, p, col("k") < 10L) // v1: pos 0..9
    LakeTable.deleteMoRVector(spark, p, col("k") >= 95L) // v2: pos 95..99
    val pd = LakeTable.positionDeletes(spark, p).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("kind"),
        r.getAs[Int]("seq")))
    assert(pd.filter(_._2 == "posdel").map(_._1).sorted.toSeq ===
      (0L until 10L), "posdel rows list their indexes verbatim")
    assert(pd.filter(_._2 == "dv").map(_._1).sorted.toSeq ===
      (95L until 100L), "DV bitmaps expand to their set bits")
    assert(pd.forall(r => if (r._2 == "posdel") r._3 == 1 else r._3 == 2),
      "each position carries its delete's sequence number")
    // equality deletes are key-granular — no position exists
    LakeTable.deleteMoR(spark, p, "k", col("k") === 50L) // v3
    assert(LakeTable.positionDeletes(spark, p).count() === 15L,
      "equality deletes never surface in position_deletes")
    // the consolidation fold preserves the position set as DVs
    LakeTable.rewritePositionDeletes(spark, p) // v4
    val folded = LakeTable.positionDeletes(spark, p).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("kind")))
    assert(folded.map(_._1).sorted.toSeq ===
      ((0L until 10L) ++ (95L until 100L)),
      "rewrite_position_delete_files preserves the position set")
    assert(folded.forall(_._2 == "dv"), "the folded representation is DV")
    // SQL route (threshold-guarded LocalScan, same rule as entries)
    spark.conf.set("spark.sql.catalog.pdt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pdt.warehouse", "/tmp/graft_test/mormeta_pdt_wh")
    try {
      SparkSpec.rmdir("/tmp/graft_test/mormeta_pdt_wh/db")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS pdt.db")
      spark.sql("CREATE TABLE pdt.db.t (k BIGINT, v DOUBLE) USING graftlake")
      spark.sql("INSERT INTO pdt.db.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 50)")
      LakeTable.deleteMoRVector(spark,
        "/tmp/graft_test/mormeta_pdt_wh/db/t", col("k") < 5L)
      assert(spark.sql("SELECT count(*) FROM pdt.db.t.position_deletes")
        .head().getLong(0) === 5L)
    } finally {
      spark.conf.unset("spark.sql.catalog.pdt")
      spark.conf.unset("spark.sql.catalog.pdt.warehouse")
    }
  }

  test("stale delete rows referencing dropped files do not undercount") {
    val p = "/tmp/graft_test/mormeta_stale"
    SparkSpec.rmdir(p)
    LakeTable.overwrite(
      (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), p)
    LakeTable.deleteMoRPositional(spark, p, col("k") < 20L)
    // CoW delete drops/rewrites the referenced files under NEW paths;
    // the posdel manifest carries but its rows now match nothing
    LakeTable.delete(spark, p, col("k") >= 90L)
    val v = LakeTable.latestVersion(p).get
    val ans = LakeTable.metadataAggregate(
      spark, p, v, Nil, Nil, needCount = true)
    // honest either way: answered → must equal the true count
    val truth = LakeTable.read(spark, p).count()
    ans.foreach(a => assert(a.count.contains(truth),
      s"metadata count ${a.count} must equal read-side $truth"))
    assert(truth === 70L)
  }
}
