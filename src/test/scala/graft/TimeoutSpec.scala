package graft

import java.sql.Timestamp
import graft.streaming.DialogueStateMachine
import graft.streaming.DialogueStateMachine.TimedTurn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Abandoned-session eviction: dialogues that stop emitting turns
  * without terminating are force-closed by an EVENT-TIME timeout once
  * the watermark passes their last activity — the state-eviction
  * behavior a 100 TB streaming deployment needs. Deterministic:
  * event-time timers + watermark, no wall clock involved. */
class TimeoutSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("abandoned dialogue times out with reason Timeout; live one keeps state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TimedTurn]
    val out = DialogueStateMachine
      .streamingSummariesWithTimeout(input.toDS(), timeoutMs = 5 * 60 * 1000)
    val query = out.writeStream.format("memory").queryName("timeout_out")
      .outputMode("append").start()
    try {
      // dialogue 1: two ordinary turns at 10:00, then silence.
      // dialogue 2: keeps emitting turns, stays live.
      input.addData(
        TimedTurn(ts(0), 1L, 1, 2, 0.5), TimedTurn(ts(0), 1L, 2, 3, 0.5),
        TimedTurn(ts(0), 2L, 1, 1, 0.5))
      query.processAllAvailable()
      assert(spark.table("timeout_out").count() === 0, "nothing should close yet")

      // watermark advances past 10:00 + 5 min via dialogue 2's turns
      input.addData(TimedTurn(ts(10), 2L, 2, 2, 0.5))
      query.processAllAvailable()
      input.addData(TimedTurn(ts(12), 2L, 3, 3, 0.5))
      query.processAllAvailable()

      val rows = spark.table("timeout_out").collect().map(r =>
        (r.getAs[Long]("dia_id"), r.getAs[String]("terminate_reason"),
          r.getAs[Int]("n_turns"), r.getAs[Int]("deepest_layer")))
      assert(rows.toSeq === Seq((1L, "Timeout", 2, 3)),
        s"dialogue 1 must time out (and only it): ${rows.toSeq}")
    } finally query.stop()
  }

  test("transformWithState timers (T10b) match the legacy timeout path scenario") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[TimedTurn]
      val query = DialogueStateMachine
        .streamingSummariesTwsTimeout(input.toDS(), timeoutMs = 5 * 60 * 1000)
        .writeStream.format("memory").queryName("tws_timeout_out")
        .outputMode("append").start()
      try {
        // same scenario as the legacy-API test above: dialogue 1 goes
        // silent after 10:00, dialogue 2 keeps the watermark moving
        input.addData(
          TimedTurn(ts(0), 1L, 1, 2, 0.5), TimedTurn(ts(0), 1L, 2, 3, 0.5),
          TimedTurn(ts(0), 2L, 1, 1, 0.5))
        query.processAllAvailable()
        assert(spark.table("tws_timeout_out").count() === 0,
          "nothing should close yet")
        input.addData(TimedTurn(ts(10), 2L, 2, 2, 0.5))
        query.processAllAvailable()
        input.addData(TimedTurn(ts(12), 2L, 3, 3, 0.5))
        query.processAllAvailable()
        val rows = spark.table("tws_timeout_out").collect().map(r =>
          (r.getAs[Long]("dia_id"), r.getAs[String]("terminate_reason"),
            r.getAs[Int]("n_turns"), r.getAs[Int]("deepest_layer")))
        assert(rows.toSeq === Seq((1L, "Timeout", 2, 3)),
          s"timer must close dialogue 1 (and only it): ${rows.toSeq}")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
