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

  test("PolyHashExpr equals the HOF fold on ASCII strings") {
    val strs = Seq("", "a", "abc", "hello world", "key agg row scan slow fast",
      "x" * 300, (0 until 50).map(i => ('a' + i % 26).toChar).mkString)
    val df = strs.toDF("s")
      .select(polyHash(col("s")).as("fast"), polyHashHof(col("s")).as("ref"))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("fast") === r.getAs[Long]("ref"))
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
      "SELECT graft_polyhash('abc') AS h, graft_dot(array(1d,2d), array(3d,4d)) AS d")
      .collect()(0)
    assert(r.getAs[Long]("h") === 96354L)
    assert(r.getAs[Double]("d") === 11.0)
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
