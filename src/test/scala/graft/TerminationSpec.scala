package graft

import graft.session.Termination
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TerminationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("precedence: empty > max_turns > no_progress_6 > perception_5") {
    // empty text wins over everything (empathy_interaction.py:299-312)
    assert(Termination.reasonFor(25, 20, List.fill(10)(5), emptyText = true)
      .contains("empty_next_user"))
    // max_turns beats stagnation
    assert(Termination.reasonFor(20, 20, List.fill(8)(3), emptyText = false)
      .contains("max_turns"))
    // six identical at layer 5: no_progress_6 fires before perception_5
    assert(Termination.reasonFor(6, 20, List.fill(6)(5), emptyText = false)
      .contains("no_progress_6"))
  }

  test("frame off-by-ones: exactly 6 same / exactly 5 at layer 5") {
    assert(Termination.reasonFor(5, 20, List.fill(5)(3), emptyText = false).isEmpty)
    assert(Termination.reasonFor(6, 20, List.fill(6)(3), emptyText = false)
      .contains("no_progress_6"))
    // five at 5 preceded by a different layer → perception_5 (not stagnation)
    assert(Termination.reasonFor(6, 20, List(4, 5, 5, 5, 5, 5), emptyText = false)
      .contains("perception_5"))
    assert(Termination.reasonFor(5, 20, List(4, 5, 5, 5, 5), emptyText = false).isEmpty)
  }

  test("batch window form agrees with the pure predicate") {
    // layers: stagnates from turn 3..8 (six 2s) → first termination at turn 8
    val layers = Seq(1, 3, 2, 2, 2, 2, 2, 2, 4, 5)
    val df = layers.zipWithIndex
      .map { case (l, i) => (1L, i + 1, l) }
      .toDF("dia_id", "turn", "layer")
    val got = Termination.firstTermination(df).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Int]("end_turn") === 8)
    assert(got(0).getAs[String]("terminate_reason") === "no_progress_6")
    // pure predicate sees the same thing at the same prefix
    assert(Termination.reasonFor(8, 20, layers.take(8).toList, emptyText = false)
      .contains("no_progress_6"))
    assert(Termination.reasonFor(7, 20, layers.take(7).toList, emptyText = false).isEmpty)
  }
}
