package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T-family widening: stream-stream interval join — the streaming
  * analogue of the batch as-of lookup (each purchase pairs with error
  * events of the same user within the 10 minutes before it). Both
  * sides are watermarked, and the event-time range condition bounds
  * the join state so Spark can evict it — the only shape a
  * stream-stream join can hold at 100 TB/day rates. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream interval join pairs events across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long)]
    val errors = MemoryStream[(Timestamp, Long)]
    val joined = purchases.toDS().toDF("pts", "user")
      .withWatermark("pts", "10 minutes")
      .join(
        errors.toDS().toDF("ets", "euser").withWatermark("ets", "10 minutes"),
        expr("""user = euser AND
                ets >= pts - INTERVAL 10 MINUTES AND ets <= pts"""))
      .select(col("user"), col("pts"), col("ets"))
    val query = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      // batch 1: error for user 1 arrives BEFORE its purchase
      errors.addData((ts(5), 1L), (ts(20), 2L))
      query.processAllAvailable()
      // batch 2: purchases — user 1 within 10 min of its error (cross-
      // batch match), user 2's error is 25 min away (out of interval),
      // user 3 has no error at all
      purchases.addData((ts(12), 1L), (ts(45), 2L), (ts(13), 3L))
      query.processAllAvailable()
      // batch 3: global watermark is now min(10:20, 10:45) − 10 min =
      // 10:10. An error at 10:08 is LATE → dropped (no pair), while
      // one at 10:11 is on time and inside purchase 10:12's interval →
      // a second pair for the same purchase, across three batches.
      errors.addData((ts(8), 1L), (ts(11), 1L))
      query.processAllAvailable()

      val rows = spark.table("ssj_out").collect()
        .map(r => (r.getAs[Long]("user"), r.getAs[Timestamp]("pts"), r.getAs[Timestamp]("ets")))
        .toSet
      assert(rows === Set(
        (1L, ts(12), ts(5)),
        (1L, ts(12), ts(11))),
        s"unexpected join output (10:08 must be dropped as late): $rows")
    } finally query.stop()
  }

  test("stream-static enrichment join stays stateless and broadcasts the dim") {
    // The OTHER streaming-join cell: stream⋈static needs NO state
    // store at all — the static side re-resolves per micro-batch and
    // broadcasts, so enrichment at 100 TB/day costs a map-side hash
    // probe per event. Dropped (unmatched inner) rows prove the join
    // actually filters, not just projects.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((0L, "NATION_0"), (1L, "NATION_1")).toDF("nk", "n_name")
    val events = MemoryStream[(Long, Long, Double)]
    val enriched = events.toDS().toDF("id", "nk", "value")
      .join(broadcast(dim), Seq("nk")) // inner: unknown nk drops
      .select(col("id"), col("n_name"), col("value"))
    val query = enriched.writeStream.format("memory").queryName("ssd_out")
      .outputMode("append").start()
    try {
      events.addData((1L, 0L, 1.0), (2L, 1L, 2.0), (3L, 9L, 3.0))
      query.processAllAvailable()
      events.addData((4L, 1L, 4.0))
      query.processAllAvailable()
      val rows = spark.table("ssd_out").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("n_name"))).toSet
      assert(rows === Set((1L, "NATION_0"), (2L, "NATION_1"), (4L, "NATION_1")),
        s"enrichment wrong (nk=9 must drop): $rows")
      // stateless: no state-store operator in the executed plan
      val progress = query.lastProgress
      assert(progress.stateOperators.isEmpty,
        s"stream-static join must not allocate state: ${progress.stateOperators.length}")
    } finally query.stop()
  }
}
