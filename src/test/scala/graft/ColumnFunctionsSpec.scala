package graft

import graft.functions.ColumnFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ColumnFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")

  test("sigmoid(0)=0.5, symmetric") {
    assert(eval1[Double](sigmoid(lit(0.0))) === 0.5)
    assert(math.abs(eval1[Double](sigmoid(lit(2.0))) + eval1[Double](sigmoid(lit(-2.0))) - 1.0) < 1e-12)
  }

  test("clamp0 clamps negatives only") {
    assert(eval1[Double](clamp0(lit(-3.5))) === 0.0)
    assert(eval1[Double](clamp0(lit(2.5))) === 2.5)
  }

  test("polyHash matches the reference fold h=(h*31+ascii)%p") {
    // 'a'=97: ((0*31+97)*31+98)*31+99 mod p = 96354 (cross-checked in DuckDB)
    assert(eval1[Long](polyHash(lit("abc"))) === 96354L)
    assert(eval1[Long](polyHash(lit(""))) === 0L)
  }

  test("seededHash Int and Column overloads agree") {
    for (seed <- Seq(0, 3, 15)) {
      val a = eval1[Long](seededHash(lit(123456789L), seed))
      val b = eval1[Long](seededHash(lit(123456789L), lit(seed)))
      assert(a === b, s"seed=$seed")
    }
  }

  test("softmax sums to 1 and argmax1 finds the max (1-based)") {
    val arr = array(lit(1.0), lit(3.0), lit(2.0))
    val probs = eval1[scala.collection.Seq[Double]](softmax(arr))
    assert(math.abs(probs.sum - 1.0) < 1e-12)
    assert(probs(1) > probs(0) && probs(1) > probs(2))
    assert(eval1[Long](argmax1(arr)) === 2L)
  }

  test("softmaxConfidence equals max of the softmax array") {
    val arr = array(lit(0.5), lit(-1.0), lit(2.5), lit(0.0))
    val conf = eval1[Double](softmaxConfidence(arr))
    val probs = eval1[scala.collection.Seq[Double]](softmax(arr))
    assert(math.abs(conf - probs.max) < 1e-12)
  }

  test("dot / l2norm / cosine basics") {
    val a = array(lit(1.0), lit(2.0), lit(2.0))
    assert(eval1[Double](dot(a, a)) === 9.0)
    assert(eval1[Double](l2norm(a)) === 3.0)
    assert(math.abs(eval1[Double](cosine(a, a)) - 1.0) < 1e-12)
  }

  test("shingleHashes3 combines materialized token hashes") {
    val df = Seq("w1 w2 w3 w4").toDF("text")
      .select(tokenHashes(col("text")).as("th"))
      .select(shingleHashes3(col("th")).as("sh"), col("th"))
    val row = df.collect()(0)
    val th = row.getAs[scala.collection.Seq[Long]]("th")
    val sh = row.getAs[scala.collection.Seq[Long]]("sh")
    val p = HashP
    def comb(a: Long, b: Long, c: Long) = (((a * 37 + b) % p) * 37 + c) % p
    assert(sh === Seq(comb(th(0), th(1), th(2)), comb(th(1), th(2), th(3))))
  }

  test("arrayMean") {
    assert(eval1[Double](arrayMean(array(lit(1.0), lit(2.0), lit(6.0)))) === 3.0)
  }

  test("sortedIntersectSize equals size(array_intersect) on random sorted sets") {
    // property parity with the builtin it replaces in the PPJoin
    // verify — random sorted-distinct long arrays, both engines
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      def mk() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (mk(), mk())
    }
    val df = rows.toDF("a", "b").select(
      sortedIntersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() === 0)
    // empty-side cases
    assert(eval1[Int](sortedIntersectSize(
      array().cast("array<long>"), array(lit(1L)))) === 0)
  }
}
