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

  test("LEFT OUTER interval join emits null matches once the watermark closes the window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long)]
    val errors = MemoryStream[(Timestamp, Long)]
    // left outer: every purchase must surface exactly once — paired
    // when an error fell in its window, null-extended when the
    // watermark PROVES no matching error can still arrive (the state
    // eviction point). The attribution query shape where absence of a
    // cause is itself the signal.
    val joined = purchases.toDS().toDF("pts", "user")
      .withWatermark("pts", "10 minutes")
      .join(
        errors.toDS().toDF("ets", "euser").withWatermark("ets", "10 minutes"),
        expr("""user = euser AND
                ets >= pts - INTERVAL 10 MINUTES AND ets <= pts"""),
        "left_outer")
      .select(col("user"), col("pts"), col("ets"))
    val query = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      // u1 pairs; u3 has no error and must eventually null-extend
      errors.addData((ts(5), 1L))
      purchases.addData((ts(12), 1L), (ts(13), 3L))
      query.processAllAvailable()
      // sentinels on DISTINCT users push both sides' event-time max
      // forward so the global watermark passes u3's window end
      // (10:13): purchases→10:40, errors→10:30 ⇒ watermark 10:30
      errors.addData((ts(40), 8L))
      purchases.addData((ts(50), 9L))
      query.processAllAvailable()
      // one more batch: outer results materialize on the batch AFTER
      // the watermark advance evicts the state
      errors.addData((ts(41), 8L))
      query.processAllAvailable()

      val rows = spark.table("ssj_outer").collect()
        .map(r => (r.getAs[Long]("user"), r.getAs[Timestamp]("pts"),
          Option(r.getAs[Timestamp]("ets")))).toSet
      assert(rows.contains((1L, ts(12), Some(ts(5)))), s"inner pair lost: $rows")
      assert(rows.contains((3L, ts(13), None)),
        s"unmatched purchase must null-extend after watermark passes its window: $rows")
      // the sentinel purchase's window (ends 10:50) is NOT yet closed
      // by the 10:30 watermark — no premature null
      assert(!rows.exists(r => r._1 == 9L),
        s"window still open ⇒ no emission for the sentinel purchase: $rows")
      // an unmatched RIGHT row never surfaces in a left outer join
      assert(!rows.exists(r => r._1 == 8L), s"right-only user leaked: $rows")
    } finally query.stop()
  }

  test("RIGHT OUTER interval join null-extends unmatched right rows on eviction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long)]
    val errors = MemoryStream[(Timestamp, Long)]
    // right outer: the ERROR side (right) surfaces exactly once —
    // paired, or null-extended when the watermark proves no purchase
    // window can still claim it (error ets matches purchases with
    // pts in [ets, ets + 10 min], so its horizon is ets + 10 min)
    val joined = purchases.toDS().toDF("pts", "user")
      .withWatermark("pts", "10 minutes")
      .join(
        errors.toDS().toDF("ets", "euser").withWatermark("ets", "10 minutes"),
        expr("""user = euser AND
                ets >= pts - INTERVAL 10 MINUTES AND ets <= pts"""),
        "right_outer")
      .select(col("euser"), col("pts"), col("ets"))
    val query = joined.writeStream.format("memory").queryName("ssj_router")
      .outputMode("append").start()
    try {
      // u1's error pairs; u3's error has no purchase and must
      // eventually null-extend
      errors.addData((ts(5), 1L), (ts(13), 3L))
      purchases.addData((ts(12), 1L))
      query.processAllAvailable()
      // advance both sides' event-time max past u3's horizon (10:23):
      // purchases→10:40, errors→10:40 ⇒ watermark 10:30
      errors.addData((ts(40), 8L))
      purchases.addData((ts(40), 9L))
      query.processAllAvailable()
      // outer results materialize on the batch AFTER the eviction
      purchases.addData((ts(41), 9L))
      query.processAllAvailable()

      val rows = spark.table("ssj_router").collect()
        .map(r => (r.getAs[Long]("euser"), Option(r.getAs[Timestamp]("pts")),
          r.getAs[Timestamp]("ets"))).toSet
      assert(rows.contains((1L, Some(ts(12)), ts(5))), s"inner pair lost: $rows")
      assert(rows.contains((3L, None, ts(13))),
        s"unmatched error must null-extend after its horizon passes: $rows")
      // an unmatched LEFT row never surfaces in a right outer join
      assert(!rows.exists(r => r._2.contains(ts(41))),
        s"left-only purchase leaked: $rows")
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
