package graft

import graft.reward.RewardConfig
import graft.streaming.{DialogueStateMachine, TurnEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** T8 stream-batch equivalence (SURVEY.md §2.9, §5.4): the
  * flatMapGroupsWithState streaming path must emit exactly what the
  * batch fold computes, including state carried across micro-batches. */
class StreamingEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val cfg = RewardConfig()

  // three dialogues with distinct termination modes
  private val stagnating = // six 3s from turn 2..7 → no_progress_6 at turn 7
    (1 to 10).map(i => TurnEvent(1L, i, if (i == 1) 1 else 3, 0.5))
  private val maxedOut = // alternating layers never stagnate → max_turns at 20
    (1 to 25).map(i => TurnEvent(2L, i, 1 + (i % 2), 0.5))
  private val perception = // 1,2,3,4,5,5,5,5,5 → perception_5 at turn 9
    (1 to 12).map(i => TurnEvent(3L, i, math.min(i, 5), 0.5))

  private val all = stagnating ++ maxedOut ++ perception

  test("batch fold produces the expected terminations") {
    val byDia = all.groupBy(_.dia_id)
    val s1 = DialogueStateMachine.runSession(1L, byDia(1L).sortBy(_.turn).iterator, cfg)
    val s2 = DialogueStateMachine.runSession(2L, byDia(2L).sortBy(_.turn).iterator, cfg)
    val s3 = DialogueStateMachine.runSession(3L, byDia(3L).sortBy(_.turn).iterator, cfg)
    assert(s1.terminate_reason === "no_progress_6" && s1.end_turn === 7)
    assert(s2.terminate_reason === "max_turns" && s2.end_turn === 20)
    assert(s3.terminate_reason === "perception_5" && s3.end_turn === 9)
    assert(s3.deepest_layer === 5)
  }

  test("streaming emits the same summaries, state carried across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TurnEvent]
    val query = DialogueStateMachine.streamingSummaries(input.toDS(), cfg)
      .writeStream.format("memory").queryName("t8_out").outputMode("append").start()
    try {
      // split mid-session so every dialogue's state crosses a batch boundary
      val (b1, b2) = all.partition(_.turn <= 5)
      input.addData(b1)
      query.processAllAvailable()
      input.addData(b2)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("t8_out").as[graft.streaming.SessionSummary]
      .collect().map(s => s.dia_id -> s).toMap
    val batch = all.groupBy(_.dia_id).map { case (k, ts) =>
      k -> DialogueStateMachine.runSession(k, ts.sortBy(_.turn).iterator, cfg)
    }
    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (k, b) =>
      val s = streamed(k)
      assert(s.end_turn === b.end_turn, s"dia $k end_turn")
      assert(s.terminate_reason === b.terminate_reason, s"dia $k reason")
      assert(s.deepest_layer === b.deepest_layer, s"dia $k deepest")
      assert(math.abs(s.mean_score - b.mean_score) < 1e-9, s"dia $k score")
    }
  }

  test("streaming near-dup emits exactly the batch banded-LSH pair set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      3L -> "quick brown fox jumps over the lazy dog again and again so",
      4L -> "completely different content about spark streaming state stores")
    val corpus = docs.toDF("doc_id", "text")
    val batchPairs = graft.llm.Dedup.minhashNearDup(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchPairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
      "the exact duplicate must band-collide with estimate 1.0")

    val input = MemoryStream[(Long, String)]
    val query = graft.streaming.StreamingDedup
      .streamingNearDupPairs(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("snd_out")
      .outputMode("append").start()
    try {
      // bucket state must cross the batch boundary: the dup pair's
      // members arrive in DIFFERENT micro-batches; doc 1 is also
      // re-delivered (at-least-once) and must be idempotent
      input.addData(docs.head, docs(3))
      query.processAllAvailable()
      input.addData(docs(1), docs(2), docs.head)
      query.processAllAvailable()
    } finally query.stop()
    import org.apache.spark.sql.functions.{col, round}
    val streamed = spark.table("snd_out")
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batchPairs,
      "the streaming pair set must equal the batch banded-LSH pair set")
  }

  test("post-termination stragglers in a LATER batch never duplicate a summary") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TurnEvent]
    val query = DialogueStateMachine.streamingSummaries(input.toDS(), cfg)
      .writeStream.format("memory").queryName("t8_dup").outputMode("append").start()
    try {
      // dialogue 1 terminates at turn 7 (no_progress_6); deliver turns
      // 1..7 in batch 1 and the post-termination turns 8..10 in batch
      // 2 — with remove-on-terminate the key would re-open and emit a
      // SECOND summary; the tombstone must swallow the stragglers
      val (b1, b2) = stagnating.partition(_.turn <= 7)
      input.addData(b1)
      query.processAllAvailable()
      input.addData(b2)
      query.processAllAvailable()
      val rows = spark.table("t8_dup").collect()
      assert(rows.length === 1, s"exactly one summary per dialogue: ${rows.toSeq}")
      assert(rows.head.getAs[String]("terminate_reason") === "no_progress_6")
      assert(rows.head.getAs[Int]("end_turn") === 7)
    } finally query.stop()
  }

  test("transformWithState (Spark 4 arbitrary-state API) matches the batch fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[TurnEvent]
      val query = DialogueStateMachine.streamingSummariesTws(input.toDS(), cfg)
        .writeStream.format("memory").queryName("tws_out").outputMode("append").start()
      try {
        val (b1, b2) = all.partition(_.turn <= 5)
        input.addData(b1)
        query.processAllAvailable()
        input.addData(b2)
        query.processAllAvailable()
      } finally query.stop()
      val streamed = spark.table("tws_out").as[graft.streaming.SessionSummary]
        .collect().map(s => s.dia_id -> s).toMap
      val batch = all.groupBy(_.dia_id).map { case (k, ts) =>
        k -> DialogueStateMachine.runSession(k, ts.sortBy(_.turn).iterator, cfg)
      }
      assert(streamed.keySet === batch.keySet)
      batch.foreach { case (k, b) =>
        val s = streamed(k)
        assert(s.end_turn === b.end_turn && s.terminate_reason === b.terminate_reason,
          s"dia $k")
        assert(math.abs(s.mean_score - b.mean_score) < 1e-9, s"dia $k score")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
