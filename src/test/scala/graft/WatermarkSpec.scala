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
}
