package graft

import graft.functions.ColumnFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen expressions + SparkSessionExtensions surface:
  * value parity with the interpreted HOF forms, SQL registry
  * availability, and the size(transform) optimizer rule. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("PolyHashExpr equals the HOF fold on ASCII and CJK strings") {
    // The reference's own corpus is Chinese (data_preprocess.py:19-24):
    // the native expression must hash CODE POINTS like the HOF form and
    // the DuckDB oracles, not UTF-8 bytes (round-1 weak-risk, fixed).
    val strs = Seq("", "a", "abc", "hello world", "key agg row scan slow fast",
      "x" * 300, (0 until 50).map(i => ('a' + i % 26).toChar).mkString,
      "中文文本", "我 很 难过", "共情 回应 层级 对话", "mixed 中英 text",
      "éàü höf", "日本語テキスト", "한국어", "emoji 😀 astral 🚀 plane")
    val df = strs.toDF("s")
      .select(polyHash(col("s")).as("fast"), polyHashHof(col("s")).as("ref"))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("fast") === r.getAs[Long]("ref"))
    }
    // pinned value: hand-computed code-point fold for "中文"
    // (20013, 25991): (20013*31 + 25991) % (1e9+7) = 646394
    val cjk = Seq("中文").toDF("s").select(polyHash(col("s")).as("h")).collect()(0)
    assert(cjk.getAs[Long]("h") === ((20013L * 31 + 25991) % HashP))
  }

  test("CharNgramsExpr equals the transform(sequence, substring) HOF form") {
    val strs = Seq("", "ab", "abc", "abcd", "hello world",
      "中文文本测试", "mixed 中英 text", "日本語テキスト",
      "emoji 😀 astral 🚀 plane") // astral chars: 1 code point each
    val hof = transform(
      sequence(lit(1), length(col("s")) - 2),
      i => substring(col("s"), i, lit(3)))
    val df = strs.toDF("s")
      .select(charNgrams(col("s"), 3).as("fast"),
        when(length(col("s")) >= 3, hof).otherwise(array()).as("ref"))
    df.collect().foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("fast") ===
        r.getAs[scala.collection.Seq[String]]("ref"))
    }
  }

  test("DotProductExpr equals the HOF fold bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(dot(col("a"), col("b")).as("fast"), dotHof(col("a"), col("b")).as("ref"))
    df.collect().foreach { r =>
      assert(r.getAs[Double]("fast") === r.getAs[Double]("ref")) // exact
    }
  }

  test("functions are SQL-registered via GraftExtensions") {
    val r = spark.sql(
      """SELECT graft_polyhash('abc') AS h, graft_dot(array(1d,2d), array(3d,4d)) AS d,
        |       graft_char_ngrams('abcd', 3) AS g,
        |       graft_token_hashes('a b') AS th,
        |       graft_minhash_sig(graft_token_hashes('a b c d'), 4) AS sig,
        |       graft_shingle_min(graft_token_hashes('a b c d')) AS sm,
        |       graft_simhash(graft_token_hashes('a b c')) AS sh,
        |       graft_levenshtein('共情回应', '共鸣回应') AS lev""".stripMargin)
      .collect()(0)
    assert(r.getAs[Long]("h") === 96354L)
    assert(r.getAs[Int]("lev") === 1) // code points, not bytes (would be 3)
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[scala.collection.Seq[String]]("g") === Seq("abc", "bcd"))
    assert(r.getAs[scala.collection.Seq[Long]]("th") === Seq(97L, 98L))
    assert(r.getAs[scala.collection.Seq[Long]]("sig").length === 4)
    assert(r.getAs[Long]("sm") > 0L)
    assert(r.getAs[Long]("sh") >= 0L)
  }

  test("SQL registry rejects non-literal size arguments with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_char_ngrams(s, length(s)) FROM (SELECT 'ab' AS s)")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("optimizer rule elides transform under size()") {
    val df = Seq("a b c d").toDF("text")
      .select(size(transform(split(col("text"), " "), x => concat(x, lit("!")))).as("n"))
    val optimized = df.queryExecution.optimizedPlan
    assert(!optimized.toString.contains("transform"),
      s"transform should be elided under size():\n$optimized")
    assert(df.collect()(0).getAs[Int]("n") === 4)
  }
}
