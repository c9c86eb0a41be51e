package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T7 watermark / late-data semantics (SURVEY.md §2.9): windowed
  * aggregation under a watermark finalizes closed windows and drops
  * events later than the threshold. */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  test("watermarked tumbling window finalizes and drops late events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))
    val query = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L), (ts(4), 2L)) // window [10:00,10:10): 2 events
      query.processAllAvailable()
      input.addData((ts(31), 3L)) // advances max event time to 10:31
      query.processAllAvailable()
      input.addData((ts(40), 4L)) // watermark now 10:21 → [10:00,10:10) final
      query.processAllAvailable()
      val afterClose = spark.table("wm_out").collect()
        .map(r => r.getAs[Timestamp]("w_start") -> r.getAs[Long]("n")).toMap
      assert(afterClose.get(ts(0)).contains(2L), s"finalized window missing: $afterClose")

      input.addData((ts(2), 9L)) // late beyond watermark → dropped
      query.processAllAvailable()
      input.addData((ts(55), 5L)) // push watermark far past everything
      query.processAllAvailable()
      input.addData((ts(59), 6L))
      query.processAllAvailable()
      val finalRows = spark.table("wm_out").collect()
        .map(r => r.getAs[Timestamp]("w_start") -> r.getAs[Long]("n")).toMap
      assert(finalRows.get(ts(0)).contains(2L),
        s"late event must not reopen the closed window: $finalRows")
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark dedupes across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDS().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val query = dedup.writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 100L), (ts(1), 100L)) // dup within batch
      query.processAllAvailable()
      input.addData((ts(2), 100L), (ts(3), 200L)) // dup across batches
      query.processAllAvailable()
    } finally query.stop()
    val ids = spark.table("dd_out").collect().map(_.getAs[Long]("id")).sorted
    assert(ids === Array(100L, 200L))
  }

  test("dropDuplicatesWithinWatermark BOUNDS state: expired keys re-admit") {
    // the 100 TB half of the contract: dedup state is evicted once the
    // watermark passes a key's horizon, so a duplicate arriving after
    // expiry is treated as new — bounded state, windowed-exactness
    // (SCALE.md's streaming-ingest-dedup deployment note)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDS().toDF("ts", "id")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("id")
    val query = dedup.writeStream.format("memory").queryName("dd_exp_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 7L))
      query.processAllAvailable()
      input.addData((ts(1), 7L)) // dup within horizon → suppressed
      query.processAllAvailable()
      // advance the watermark far beyond 10:00 + 5 min → key 7 evicted
      input.addData((ts(30), 8L))
      query.processAllAvailable()
      input.addData((ts(31), 7L)) // same id, after expiry → re-admitted
      query.processAllAvailable()
    } finally query.stop()
    val sevens = spark.table("dd_exp_out").collect()
      .map(_.getAs[Long]("id")).count(_ == 7L)
    assert(sevens === 2,
      "expired dedup key must re-admit (state is bounded, not global)")
  }

  test("ingest dedup within watermark: state size is bounded, late dups dropped") {
    // The 100 TB contract of StreamingDedup.dedupWithinWatermark,
    // proven from the engine's own state telemetry: (a) the state
    // plateau built by a wide batch is EVICTED once the watermark
    // passes its horizon (numRowsTotal collapses instead of growing
    // monotonically, as plain dropDuplicates state would), and (b) a
    // duplicate arriving BEHIND the watermark is dropped outright —
    // it neither re-emits (despite its key's state being gone) nor
    // re-enters state.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val dedup = graft.streaming.StreamingDedup.dedupWithinWatermark(
      input.toDS().toDF("ts", "text"), "ts", "5 minutes", "text")
    val query = dedup.writeStream.format("memory").queryName("dd_bound_out")
      .outputMode("append").start()
    def stateRows(): Long =
      Option(query.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
        .map(_.numRowsTotal).sum
    try {
      // a wide first batch: 100 distinct texts → 100 state rows
      input.addData((0 until 100).map(i => (ts(0, i % 60), s"doc-$i")): _*)
      query.processAllAvailable()
      val plateau = stateRows()
      assert(plateau >= 100L, s"dedup state must hold the 100 keys, got $plateau")
      // advance event time far past 10:00 + 5 min; the NEXT batch runs
      // with the advanced watermark and sweeps the expired keys
      input.addData((ts(30), "fresh-a"))
      query.processAllAvailable()
      input.addData((ts(31), "fresh-b"))
      query.processAllAvailable()
      val afterEvict = stateRows()
      assert(afterEvict <= 5L,
        s"watermark must evict the expired plateau (bounded state), " +
          s"got $afterEvict rows after eviction vs $plateau at plateau")
      // a duplicate of doc-0 arriving BEHIND the watermark: state for
      // it is gone, but the row is late → dropped, not re-emitted
      input.addData((ts(1), "doc-0"))
      query.processAllAvailable()
      input.addData((ts(32), "fresh-c")) // one more batch to flush
      query.processAllAvailable()
    } finally query.stop()
    val emitted = spark.table("dd_bound_out").collect().map(_.getAs[String]("text"))
    assert(emitted.count(_ == "doc-0") === 1,
      "a late duplicate behind the watermark must be dropped, not re-admitted")
    assert(emitted.count(_ == "fresh-c") === 1)
  }
}
