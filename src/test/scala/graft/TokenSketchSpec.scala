package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch guarantees against exact counts: never an
  * under-count, over-count bounded by ε·N. Deterministic: fixed seed,
  * associative merge (partition order cannot change the estimate
  * beyond the bound, and the bound is what we assert). */
class TokenSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  test("CMS estimates are >= exact and within eps*N for every token") {
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val eps = 0.001
    val cms = llm.TextAnalysis.tokenCountSketch(spark, dir, eps = eps)
    val slack = math.ceil(eps * n).toLong
    exact.foreach { case (tok, cnt) =>
      val est = cms.estimateCount(tok)
      assert(est >= cnt, s"CMS must never under-count: $tok est=$est exact=$cnt")
      assert(est <= cnt + slack,
        s"CMS over-count beyond eps*N: $tok est=$est exact=$cnt slack=$slack")
    }
  }

  test("CMS total count equals the stream length exactly") {
    val cms = llm.TextAnalysis.tokenCountSketch(spark, dir)
    val n = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token")).count()
    assert(cms.totalCount() === n)
  }
}
