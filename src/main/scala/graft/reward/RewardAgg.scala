package graft.reward

import graft.streaming.DialogueStateMachine
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** One classified turn, the Aggregator's input row. */
final case class TurnIn(dia_id: Long, turn: Int, layer: Int, confidence: Double)

/** Trajectory reward as a typed UDAF (SURVEY.md §2.11): the literal
  * sequential fold of `reward.py:28-69`, carrying `last_layer` through
  * the turn-ordered history. This is the cross-check implementation
  * against the window-function form (Reward.trajectoryReward) — the
  * equivalence is property-tested in RewardSpec, including groups
  * longer than the streaming MaxTurns cap.
  *
  * The buffer holds the whole turn list because the fold is
  * order-sensitive while Spark feeds aggregators in partition order;
  * sorting happens once in finish(). Memory bound = the LONGEST LOGGED
  * DIALOGUE (driver events-per-user can exceed MaxTurns), NOT
  * max_turns: batch scoring deliberately folds the full logged
  * history, exactly like the window form and `reward.py` itself. The
  * STREAMING state machine is the one place the MaxTurns cap applies —
  * there the rollout loop stops EMITTING turns at termination
  * (DialogueStateMachine.runSession), so capping here would double-
  * apply it and diverge from the window form's oracle. Scoring
  * arithmetic is shared with the state machine (scoreTurn). */
class RewardAgg(cfg: RewardConfig = RewardConfig())
    extends Aggregator[TurnIn, List[TurnIn], Double] {

  def zero: List[TurnIn] = Nil
  def reduce(b: List[TurnIn], a: TurnIn): List[TurnIn] = a :: b
  def merge(b1: List[TurnIn], b2: List[TurnIn]): List[TurnIn] = b1 ::: b2

  def finish(buf: List[TurnIn]): Double = {
    val sorted = buf.sortBy(_.turn)
    if (sorted.size < cfg.minTurns) 0.0
    else {
      var last = sorted.head.layer // first turn: lag defaults to own layer (reward.py:48)
      var sum = 0.0
      sorted.foreach { t =>
        sum += DialogueStateMachine.scoreTurn(t.layer, last, t.confidence, cfg)
        last = t.layer
      }
      BigDecimal(sum / sorted.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  def bufferEncoder: Encoder[List[TurnIn]] = ExpressionEncoder()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object RewardAgg {
  /** Driver query: the Aggregator path over the events-derived turns —
    * same oracle math as reward_trajectory, different execution plan
    * (ObjectHashAggregate instead of window + hash aggregate). */
  def rewardTrajectoryAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Reward.turnsFromEvents(s, d)
      .select(col("dia_id"), col("turn"), col("layer"), col("confidence"))
      .as[TurnIn]
      .groupByKey(_.dia_id)
      .agg(new RewardAgg().toColumn.name("reward"))
      .toDF("dia_id", "reward")
      .orderBy("dia_id")
  }
}
