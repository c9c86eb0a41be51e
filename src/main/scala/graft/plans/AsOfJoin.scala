package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join (SURVEY.md §2.3 J6) — the whole-operator custom
  * path of the mandate's preference ladder: LogicalPlan + Strategy +
  * SparkPlan, registered through [[graft.GraftExtensions]].
  *
  * Semantics: for every left row, attach the LATEST right row of the
  * same key whose time ≤ the left row's time (null-extended when none
  * exists) — the point-in-time lookup Spark SQL lacks natively.
  *
  * Physical shape (the 100 TB story): both sides hash-partitioned on
  * the key and sorted by (key, time) — a sort-merge join's input
  * requirements, satisfied by EnsureRequirements — then one forward
  * merge pass per partition carrying a single candidate row of state:
  * O(|L|+|R|) per partition, no row explosion, no window
  * materialization of the right side.
  *
  * Contract: key and time expressions must be LongType (see
  * Tables.tsMicros); right-side columns should be pre-aliased to
  * names distinct from the left's (as with any self-join). NULL keys
  * or times follow SQL equi-join semantics: a null left row is
  * null-extended, a null right row is never a candidate.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    leftTie: Option[Expression] = None,
    rightTie: Option[Expression] = None)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  protected override def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinPlan → AsOfJoinExec (injectPlannerStrategy). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, ltie, rtie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ltie, rtie) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    leftTie: Option[Expression] = None,
    rightTie: Option[Expression] = None)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ++
        leftTie.map(SortOrder(_, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        rightTie.map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val (ltie, rtie) = (leftTie, rightTie)
    val tied = ltie.isDefined && rtie.isDefined
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk, lt) ++ ltie.toSeq, lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk, rt) ++ rtie.toSeq, rOut)
      // explicit all-nullable BoundReferences: binding output attrs by
      // exprId would inherit the child attributes' nullability and a
      // non-nullable reference reads 0 from the null-extension row
      // instead of null
      val outProj = UnsafeProjection.create(
        output.zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(i, a.dataType, nullable = true)
        })
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      var candRow: InternalRow = null // latest right row with key=candKey, time ≤ seen left time
      var candKey: Long = 0L
      var hasCand = false

      lIter.map { lRow =>
        val lProj = lKeyProj(lRow)
        // NULL key/time on the left can never match (SQL equi-join
        // semantics) → null-extend without consuming right rows.
        // Ascending sort puts right-side nulls FIRST, so null right
        // rows are discarded up front and never become candidates —
        // without the isNullAt guards a NULL would read as 0 and
        // silently match real key-0/time-0 rows.
        // A NULL left tie gets the same treatment (it would otherwise
        // read as 0 and reject every equal-time right row silently).
        if (lProj.isNullAt(0) || lProj.isNullAt(1) || (tied && lProj.isNullAt(2))) {
          outProj(joined(lRow, nullRight))
        } else {
          val lKeyV = lProj.getLong(0)
          val lTimeV = lProj.getLong(1)
          val lTieV = if (tied) lProj.getLong(2) else 0L
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rProj = rKeyProj(rBuf.head)
            if (rProj.isNullAt(0) || rProj.isNullAt(1)) rBuf.next() // nulls sort first: discard
            else {
              val rKeyV = rProj.getLong(0)
              val rTimeV = rProj.getLong(1)
              // WITHOUT a tiebreak, equal times are admitted (classic
              // as-of ≤ semantics). WITH one, an equal-time right row
              // is admitted only if its tie value sorts STRICTLY
              // before the left's — the window-form semantics of a
              // (time, tie)-ordered event stream, where a same-time
              // row with a larger tie has not "happened yet"
              val admitTie =
                !tied || (!rProj.isNullAt(2) && rProj.getLong(2) < lTieV)
              if (rKeyV < lKeyV) rBuf.next() // smaller key: discard
              else if (rKeyV == lKeyV &&
                  (rTimeV < lTimeV || (rTimeV == lTimeV && admitTie))) {
                candRow = rBuf.next().copy(); candKey = rKeyV; hasCand = true
              } else advancing = false
            }
          }
          val matched = hasCand && candKey == lKeyV
          outProj(joined(lRow, if (matched) candRow else nullRight))
        }
      }
    }
  }

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API: resolve key/time columns BY NAME against each
  * side (LongType required). */
object AsOf {
  private def attr(df: DataFrame, name: String): Attribute =
    GraftSqlShim.analyzedPlan(df).output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in [${GraftSqlShim.analyzedPlan(df).output.map(_.name).mkString(",")}]"))

  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame =
    asofJoin(left, right, leftKey, rightKey, leftTime, rightTime, None, None)

  /** Tie-broken form: right rows at the SAME time as a left row are
    * admitted only when rightTie < leftTie — the semantics of an
    * event stream totally ordered by (time, tie), e.g. (ts_us,
    * event_id) after ns→µs truncation can tie timestamps that the id
    * still orders. Tie columns must be LongType and non-null. */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftTie: Option[String], rightTie: Option[String]): DataFrame = {
    require(leftTie.isDefined == rightTie.isDefined,
      "asofJoin: tiebreak columns must be given for both sides or neither")
    // self-register the strategy so the operator also works in
    // sessions built without spark.sql.extensions=graft.GraftExtensions
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val plan = AsOfJoinPlan(
      GraftSqlShim.analyzedPlan(left), GraftSqlShim.analyzedPlan(right),
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTime), attr(right, rightTime),
      leftTie.map(attr(left, _)), rightTie.map(attr(right, _)))
    GraftSqlShim.ofRows(left.sparkSession, plan)
  }
}
