package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located bucketed join (SURVEY.md §2.3 / 100 TB posture): both
  * fact tables bucketed + sorted on the join key join WITHOUT a
  * shuffle exchange — the pre-partitioning strategy for repeated big
  * joins at scale. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("bucketed-by-key tables join with no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // in-memory catalog: DROP forgets the table but a previous JVM's
    // files survive in the warehouse dir — remove them on disk too
    Seq("b_orders", "b_lineitem").foreach(t => SparkSpec.rmdir(s"/tmp/graft_warehouse/$t"))
    Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("rev"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // same results as the plain (shuffling) join
    val plain = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("rev"))
    assert(joined.count() === plain.count())
    val a = joined.orderBy("o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = plain.orderBy("o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }
}
