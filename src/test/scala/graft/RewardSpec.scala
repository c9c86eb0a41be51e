package graft

import graft.reward.{Reward, RewardAgg, RewardConfig, TurnIn}
import graft.streaming.DialogueStateMachine
import org.scalatest.funsuite.AnyFunSuite

class RewardSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val cfg = RewardConfig()

  private def windowReward(turns: Seq[TurnIn]): Map[Long, Double] = {
    val df = turns.toDF()
    Reward.trajectoryReward(df, cfg).collect()
      .map(r => r.getAs[Long]("dia_id") -> r.getAs[Double]("reward")).toMap
  }

  test("fewer than 5 turns gates reward to 0 (reward.py:25-26)") {
    val turns = (1 to 4).map(i => TurnIn(1L, i, i, 0.5))
    assert(windowReward(turns) === Map(1L -> 0.0))
  }

  test("first turn lag defaults to own layer → depth-only score (reward.py:48)") {
    val t = TurnIn(1L, 1, 3, 1.0)
    val score = DialogueStateMachine.scoreTurn(3, 3, 1.0, cfg)
    // progress/regress/skip are all 0: raw = depth * conf-scale
    val raw = (3 / 5.0) * (0.5 + 0.5 * 1.0)
    assert(math.abs(score - 1.0 / (1.0 + math.exp(-cfg.k * (raw - cfg.c)))) < 1e-12)
    // and the window impl agrees on a single-turn frame (gated to 0 by <5 anyway)
    assert(windowReward(Seq(t)) === Map(1L -> 0.0))
  }

  test("layer skip is penalized: 1→3 jump scores below 1→2 step") {
    val skip = DialogueStateMachine.scoreTurn(3, 1, 0.8, cfg)
    val step = DialogueStateMachine.scoreTurn(2, 1, 0.8, cfg)
    assert(skip < step)
  }

  test("regression scores below staying put") {
    val regress = DialogueStateMachine.scoreTurn(2, 3, 0.8, cfg)
    val stay = DialogueStateMachine.scoreTurn(3, 3, 0.8, cfg)
    assert(regress < stay)
  }

  test("deep stable trajectory outscores shallow stable trajectory") {
    val deep = (1 to 6).map(i => TurnIn(1L, i, 5, 0.9))
    val shallow = (1 to 6).map(i => TurnIn(2L, i, 1, 0.9))
    val r = windowReward(deep ++ shallow)
    assert(r(1L) > r(2L))
  }

  test("property: window impl == Aggregator fold on random histories") {
    // deterministic pseudo-random histories (seeded — no framework dep)
    val rnd = new scala.util.Random(42)
    val agg = new RewardAgg(cfg)
    val dialogues = (0 until 40).map { d =>
      // lengths straddle the streaming MaxTurns cap (20): batch scoring
    // folds the FULL logged history — documented divergence from the
    // streaming path, which stops EMITTING turns at termination
    val n = 1 + rnd.nextInt(35)
      d.toLong -> List.fill(n)((1 + rnd.nextInt(5), rnd.nextInt(101) / 100.0))
    }
    val turns = dialogues.flatMap { case (id, hist) =>
      hist.zipWithIndex.map { case ((l, c), i) => TurnIn(id, i + 1, l, c) }
    }
    val fromWindow = windowReward(turns)
    dialogues.foreach { case (id, hist) =>
      val ts = hist.zipWithIndex.map { case ((l, c), i) => TurnIn(id, i + 1, l, c) }
      val fromAgg = agg.finish(ts.reverse.foldLeft(agg.zero)(agg.reduce))
      assert(math.abs(fromWindow(id) - fromAgg) < 1e-9,
        s"dia=$id window=${fromWindow(id)} agg=$fromAgg hist=$hist")
    }
  }

  test("Aggregator driver query matches window driver query at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val w = Reward.rewardTrajectory(spark, dir).collect()
      .map(r => r.getAs[Long]("dia_id") -> r.getAs[Double]("reward")).toMap
    val a = RewardAgg.rewardTrajectoryAgg(spark, dir).collect()
      .map(r => r.getAs[Long]("dia_id") -> r.getAs[Double]("reward")).toMap
    assert(w.keySet === a.keySet)
    w.foreach { case (k, v) => assert(math.abs(v - a(k)) < 1e-9, s"dia $k") }
  }

  test("preference_pairs: one pair per group, smallest-id tie-break, all-tied groups drop") {
    import spark.implicits._
    val tmp = "/tmp/graft_test/pref_pairs"
    Seq(
      // group 1: clear best (id 11) and worst (id 13)
      (11L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a", 5.0, "{}"),
      (12L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L, "a", 3.0, "{}"),
      (13L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 1L, "a", 1.0, "{}"),
      // group 2: best value tied between ids 22 and 21 -> 21 wins
      (22L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "a", 9.0, "{}"),
      (21L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 2L, "a", 9.0, "{}"),
      (23L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2L, "a", 2.0, "{}"),
      // group 3: all members tie -> no preference signal, no pair
      (31L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 3L, "a", 4.0, "{}"),
      (32L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 3L, "a", 4.0, "{}"),
      // group 4: a single rollout cannot form a pair
      (41L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 4L, "a", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Reward.preferencePairs(spark, tmp).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Double]("margin")))).toMap
    assert(got === Map(
      1L -> ((11L, 13L, 4.0)),
      2L -> ((21L, 23L, 7.0))), s"got $got")
  }
}
