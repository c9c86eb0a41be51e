package graft.session

import graft.reward.Reward
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-termination predicates (SURVEY.md §2.5 W3–W5), shared by the
  * batch replay queries here and the streaming state machine
  * (graft.streaming) so the two paths cannot drift (§7.5 risk 3).
  *
  * Reference behavior (`empathy_interaction.py:299-312`), precedence
  * order: empty_next_user > max_turns > no_progress_6 > perception_5.
  *   - max_turns:    turn_index >= max_turns (default 20,
  *                   `empathy_interaction.py:69`)
  *   - no_progress_6: the last 6 turns all have the same layer
  *   - perception_5:  the last 5 turns are all at the deepest layer (5)
  */
object Termination {
  val MaxTurns = 20
  val DeepestLayer = 5

  /** Pure predicate used by the streaming path on an in-memory layer
    * history (most-recent-last). Mirrors the batch windows exactly. */
  def reasonFor(turnIndex: Int, maxTurns: Int, layerHistory: Seq[Int], emptyText: Boolean): Option[String] =
    if (emptyText) Some("empty_next_user")
    else if (turnIndex >= maxTurns) Some("max_turns")
    else if (layerHistory.size >= 6 && layerHistory.takeRight(6).distinct.size == 1)
      Some("no_progress_6")
    else if (layerHistory.size >= 5 && layerHistory.takeRight(5).forall(_ == DeepestLayer))
      Some("perception_5")
    else None

  /** Batch form: per-turn termination decision over an ordered turns
    * table (dia_id, turn, layer). Frames are the off-by-one-sensitive
    * part: "last 6" = rows between 5 preceding and current. */
  def withTerminationReason(turns: DataFrame, maxTurns: Int = MaxTurns): DataFrame = {
    val w = Window.partitionBy("dia_id").orderBy("turn")
    val last6 = w.rowsBetween(-5, 0)
    val last5 = w.rowsBetween(-4, 0)
    val noProgress6: Column =
      count(lit(1)).over(last6) === 6 &&
        min(col("layer")).over(last6) === max(col("layer")).over(last6)
    val perception5: Column =
      count(lit(1)).over(last5) === 5 && min(col("layer")).over(last5) === DeepestLayer
    turns.withColumn(
      "terminate_reason",
      when(col("turn") >= maxTurns, lit("max_turns"))
        .when(noProgress6, lit("no_progress_6"))
        .when(perception5, lit("perception_5"))
        .otherwise(lit(null).cast("string")))
  }

  /** First terminating turn per dialogue (the turn at which the
    * streaming session would actually close). */
  def firstTermination(turns: DataFrame, maxTurns: Int = MaxTurns): DataFrame = {
    val w = Window.partitionBy("dia_id").orderBy("turn")
    withTerminationReason(turns, maxTurns)
      .filter(col("terminate_reason").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("dia_id"), col("turn").as("end_turn"), col("terminate_reason"))
      .orderBy("dia_id")
  }

  /** Driver-table query: termination replay over the events-derived
    * turns table. */
  def sessionTermination(spark: SparkSession, dir: String): DataFrame =
    firstTermination(Reward.turnsFromEvents(spark, dir))
}
