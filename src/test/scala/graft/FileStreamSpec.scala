package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end file-based streaming (SURVEY.md §2.9): parquet file
  * source → watermarked tumbling window aggregation → parquet sink
  * with checkpointed exactly-once state, across TWO incremental runs
  * (Trigger.AvailableNow) that share a checkpoint — the deployment
  * shape of the batch window queries in streaming/EventTimeWindows. */
class FileStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def rmdir(p: String): Unit = SparkSpec.rmdir(p)

  test("incremental file stream with watermark appends finalized daily windows") {
    val src = "/tmp/graft_test/stream_src"
    val out = "/tmp/graft_test/stream_out"
    val chk = "/tmp/graft_test/stream_chk"
    Seq(src, out, chk).foreach(rmdir)

    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), Tables.tsFromNanos("ts").as("tstamp"), col("value"))

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, tstamp TIMESTAMP, value DOUBLE")
        .parquet(src)
        .withWatermark("tstamp", "1 hour")
        .groupBy(window(col("tstamp"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
        .select(col("w.start").as("day_start"), col("n"), col("sum_value"))
      val q = stream.writeStream
        .format("parquet")
        .option("checkpointLocation", chk)
        .option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // two arrivals sharing one checkpoint, split in EVENT TIME so the
    // second batch never lands behind the first run's watermark (late
    // data would be dropped and the full-batch comparison would fail)
    val cutoff = to_timestamp(lit("2024-01-15"))
    ev.filter(col("tstamp") < cutoff).write.mode("append").parquet(src)
    runOnce()
    ev.filter(col("tstamp") >= cutoff).write.mode("append").parquet(src)
    runOnce()

    val emitted = spark.read.parquet(out)
    assert(emitted.count() > 0, "watermark should have finalized some daily windows")
    // every emitted window must match the full-batch computation exactly
    val batch = ev
      .groupBy(window(col("tstamp"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
      .select(col("w.start").as("day_start"), col("n"), col("sum_value"))
    val batchMap = batch.collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    emitted.collect().foreach { r =>
      val k = r.getAs[java.sql.Timestamp]("day_start")
      val exp = batchMap(k)
      assert(r.getAs[Long]("n") === exp._1, s"window $k count")
      assert(math.abs(r.getAs[Double]("sum_value") - exp._2) < 1e-6, s"window $k sum")
    }
  }

  test("dedup state survives a query RESTART from the checkpoint") {
    // a resumed dropDuplicates stream must not re-emit keys it saw
    // before the stop — the state-store recovery contract a 100 TB
    // ingest dedup depends on (a re-emission would double-count
    // downstream)
    val src = "/tmp/graft_test/dedup_restart_src"
    val out = "/tmp/graft_test/dedup_restart_out"
    val chk = "/tmp/graft_test/dedup_restart_chk"
    Seq(src, out, chk).foreach(rmdir)
    import spark.implicits._

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("k LONG, payload STRING")
        .parquet(src)
        .dropDuplicates("k")
        .writeStream
        .format("parquet")
        .option("checkpointLocation", chk)
        .option("path", out)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq((1L, "a"), (2L, "b")).toDF("k", "payload")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() === 2)
    // second ARRIVAL after a full stop: keys 1 and 2 are replays the
    // recovered state must suppress; only key 3 is new
    Seq((1L, "a-again"), (2L, "b-again"), (3L, "c")).toDF("k", "payload")
      .write.mode("append").parquet(src)
    runOnce()
    val keys = spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    assert(keys === Seq(1L, 2L, 3L),
      s"restart must emit each key exactly once across runs, got $keys")
  }
}
