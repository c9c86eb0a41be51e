package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error contract of the approximate-quantile sketch: percentile_approx
  * (Greenwald–Khanna) guarantees a returned value whose RANK is within
  * n/accuracy of the requested rank. Verified against the exact sorted
  * data per group — the same bound-vs-exact discipline as
  * TokenSketchSpec's count-min check. */
class ApproxQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"
  private val Accuracy = 100

  test("approx quantiles land within the guaranteed rank error of exact") {
    val approx = ops.Relational.approxQuantilesRaw(spark, dir, Accuracy).collect()
      .map(r => r.getAs[String]("event_type") ->
        Seq(r.getAs[Double]("q25"), r.getAs[Double]("q50"),
          r.getAs[Double]("q75"), r.getAs[Double]("q90"))).toMap
    assert(approx.nonEmpty)

    val byType = Tables.load(spark, dir, "events")
      .select("event_type", "value").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("value"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    for ((tpe, qs) <- approx; (q, v) <- Seq(0.25, 0.5, 0.75, 0.9).zip(qs)) {
      val sorted = byType(tpe)
      val n = sorted.length
      // rank of the returned value in the exact data
      val rank = sorted.count(_ <= v)
      val eps = math.max(1.0, n.toDouble / Accuracy) // GK bound, floor 1 rank
      assert(math.abs(rank - q * n) <= eps + 1,
        s"$tpe q=$q: value $v has rank $rank, want ${q * n} ± $eps (n=$n)")
    }
  }

  test("the declared gate query emits all-true bound flags") {
    val rows = ops.Relational.approxQuantiles(spark, dir, Accuracy).collect()
    assert(rows.nonEmpty)
    for (r <- rows; c <- Seq("q25_ok", "q50_ok", "q75_ok", "q90_ok"))
      assert(r.getAs[Boolean](c), s"${r.getAs[String]("event_type")}.$c")
  }
}
