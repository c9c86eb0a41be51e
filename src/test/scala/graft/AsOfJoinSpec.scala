package graft

import graft.plans.AsOf
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the native as-of join operator. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("latest right ≤ left time per key; null when none; exact tie matches") {
    val left = Seq( // (event, key, time)
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 50L), // key 10
      (4L, 20L, 500L), // key 20: no right rows at all
      (5L, 30L, 100L)) // key 30: right only AFTER this time
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq( // (key, time, tag)
      (10L, 100L, "a"), // exact tie with left t=100
      (10L, 150L, "b"),
      (30L, 200L, "z"))
      .toDF("r_user_id", "r_ts", "r_tag")

    val got = AsOf.asofJoin(left, right, "user_id", "r_user_id", "ts_us", "r_ts")
      .select("event_id", "r_ts", "r_tag")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_ -> r.getString(2)))
      .toMap

    assert(got(1L).contains(100L -> "a")) // tie: time ≤ matches
    assert(got(2L).contains(150L -> "b")) // latest of the two priors
    assert(got(3L).isEmpty) // before any right row of key 10
    assert(got(4L).isEmpty) // key absent on right
    assert(got(5L).isEmpty) // right row exists but only later
  }

  test("tiebreak: same-time right rows admit only when their tie orders first") {
    val left = Seq( // (event, key, time, tie)
      (1L, 10L, 100L, 5L), // tie 5: same-time right rows with tie < 5 admit
      (2L, 10L, 100L, 1L), // tie 1: the same-time right row (tie 3) is 'later'
      (3L, 10L, 200L, 9L)) // strictly later time: ties irrelevant
      .toDF("event_id", "user_id", "ts_us", "tie")
    val right = Seq( // (key, time, tie, tag)
      (10L, 100L, 3L, "same_t"), // ties with the t=100 lefts
      (10L, 50L, 99L, "early")) // strictly earlier: always admissible
      .toDF("r_user_id", "r_ts", "r_tie", "r_tag")

    val got = AsOf.asofJoin(left, right, "user_id", "r_user_id",
        "ts_us", "r_ts", Some("tie"), Some("r_tie"))
      .select("event_id", "r_tag")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap

    assert(got(1L).contains("same_t"), // 3 < 5: the tied row has happened
      s"got $got")
    assert(got(2L).contains("early"), // 3 > 1: tied row not yet happened
      s"got $got")
    assert(got(3L).contains("same_t")) // later time: latest admissible wins
    // untied form admits all equal-time rows (contract unchanged)
    val untied = AsOf.asofJoin(left, right, "user_id", "r_user_id", "ts_us", "r_ts")
      .select("event_id", "r_tag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(untied(2L) === "same_t")
  }

  test("NULL left tie null-extends instead of silently reading as 0") {
    // Without the symmetric isNullAt guard a NULL left tie reads 0
    // through getLong, so every equal-time right row is rejected
    // (rTie < 0 never holds) — round-8 ADVICE. The contract says tie
    // columns are non-null; a violation must null-extend like a null
    // key/time does, not fabricate tie value 0.
    val left = Seq(
      (1L, 10L, Some(100L), None: Option[Long]), // null tie → null-extend
      (2L, 10L, Some(100L), Some(5L))) // sane row unaffected
      .toDF("event_id", "user_id", "ts_us", "tie")
    val right = Seq((10L, 100L, 3L, "same_t"))
      .toDF("r_user_id", "r_ts", "r_tie", "r_tag")
    val got = AsOf.asofJoin(left, right, "user_id", "r_user_id",
        "ts_us", "r_ts", Some("tie"), Some("r_tie"))
      .select("event_id", "r_tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).isEmpty, s"null left tie must null-extend, got $got")
    assert(got(2L).contains("same_t"))
  }

  test("NULL keys/times: null left rows null-extend, null right rows never match") {
    // Without the isNullAt guards, a NULL key/time reads as 0 through
    // getLong and can match real key-0/time-0 rows (round-1 ADVICE).
    val left = Seq(
      (1L, Some(0L), Some(0L)), // real key 0, time 0
      (2L, None, Some(100L)), // null key
      (3L, Some(10L), None), // null time
      (4L, Some(10L), Some(100L))) // normal row
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (Some(0L), Some(0L), "zero"), // legitimately matches left event 1
      (None, Some(50L), "nullkey"), // must never be a candidate
      (Some(10L), None, "nulltime"), // must never be a candidate
      (Some(10L), Some(90L), "ok"))
      .toDF("r_user_id", "r_ts", "r_tag")

    val got = AsOf.asofJoin(left, right, "user_id", "r_user_id", "ts_us", "r_ts")
      .select("event_id", "r_tag")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap

    assert(got(1L).contains("zero")) // real 0s still match each other
    assert(got(2L).isEmpty) // null key → null-extended
    assert(got(3L).isEmpty) // null time → null-extended
    assert(got(4L).contains("ok")) // null right rows skipped, real one wins
  }

  test("matches the window-form query on driver data") {
    val dir = "/root/testdata/sf0.001"
    val a = ops.Relational.asofLatestError(spark, dir).collect().map(_.toSeq)
    val b = ops.Relational.asofNativeLatestError(spark, dir).collect().map(_.toSeq)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }
}
