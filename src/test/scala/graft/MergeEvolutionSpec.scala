package graft

import graft.sources.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S9e — MERGE WITH SCHEMA EVOLUTION: source-only columns evolve the
  * target (SET * writes them on matched rows, inserts carry them,
  * untouched rows read null); without the clause a wider source
  * refuses loudly. */
class MergeEvolutionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s
  }
  private val wh = "/tmp/graft_test/evo_wh"

  private def setup(): Unit = {
    SparkSpec.rmdir(wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.evo")
    spark.sql("DROP TABLE IF EXISTS graft.evo.t")
    spark.sql("CREATE TABLE graft.evo.t (k BIGINT, v STRING) USING graftlake")
    spark.sql("INSERT INTO graft.evo.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("""SELECT CAST(2 AS BIGINT) AS k, 'B' AS v, 99 AS extra
                 UNION ALL SELECT CAST(3 AS BIGINT), 'c', 42""")
      .createOrReplaceTempView("evo_src")
  }

  test("WITH SCHEMA EVOLUTION: SET * writes the new column on matched rows, inserts carry it, untouched read null") {
    setup()
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft.evo.t t USING evo_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT k, v, extra FROM graft.evo.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq
    assert(got === Seq(
      (1L, "a", None),          // untouched: honest null
      (2L, "B", Some(99)),      // matched: SET * wrote the evolved column
      (3L, "c", Some(42))))     // inserted: source row shipped whole
  }

  test("without the clause a wider source refuses loudly; projecting it away still works") {
    setup()
    val ex = intercept[Exception] {
      spark.sql("""MERGE INTO graft.evo.t t USING evo_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(ex.getMessage.contains("SCHEMA EVOLUTION"), ex.getMessage)
    // nothing committed by the refusal
    assert(spark.sql("SELECT count(*) FROM graft.evo.t").head.getLong(0) === 2L)
    spark.sql("SELECT k, v FROM evo_src").createOrReplaceTempView("evo_src_narrow")
    spark.sql("""MERGE INTO graft.evo.t t USING evo_src_narrow s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table("graft.evo.t").columns.toSeq === Seq("k", "v"))
    assert(spark.sql("SELECT count(*) FROM graft.evo.t").head.getLong(0) === 3L)
  }

  test("explicit-assignment UPDATE-only merge tolerates a wider source and never widens the schema") {
    setup()
    // no star, no insert: the extra column is never written, so a
    // wider source is legal WITHOUT the evolution clause...
    spark.sql("""MERGE INTO graft.evo.t t USING evo_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(spark.table("graft.evo.t").columns.toSeq === Seq("k", "v"))
    assert(spark.sql("SELECT v FROM graft.evo.t WHERE k = 2").head.getString(0) === "B")
    // ...and even WITH the clause it must not evolve as a side effect
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft.evo.t t USING evo_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(spark.table("graft.evo.t").columns.toSeq === Seq("k", "v"),
      "an unreferenced source-only column must not widen the schema")
  }

  test("library surface: evolveColumns on the MoR merge — delete+replace carries the new column") {
    import spark.implicits._
    val p = s"$wh/lib_mor"
    SparkSpec.rmdir(p)
    LakeTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), p)
    val src = Seq((2L, "B", 99), (3L, "c", 42)).toDF("k", "v", "extra")
    LakeTable.mergeConditionalMoR(src, p, "k",
      matched = Seq(LakeTable.MatchedUpdate(None,
        Map("v" -> col("s.v"), "extra" -> col("s.extra")))),
      notMatchedInsert = Some(lit(true)),
      evolveColumns = Seq("extra"))
    val got = LakeTable.read(spark, p).select("k", "v", "extra").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
    assert(got === Set((1L, "a", None), (2L, "B", Some(99)), (3L, "c", Some(42))))
  }
}
