package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k accumulator (SURVEY.md §2.11's TypedImperativeAggregate
  * candidate): keeps the k best (score, id) pairs in a min-heap while
  * aggregating, instead of materializing and sorting every candidate
  * row under a row_number window. At 100 TB this is the difference
  * between an O(n) single-pass partial aggregate (map-side combine
  * shrinks every partition to ≤k rows before the shuffle) and a full
  * per-group sort of the candidate set.
  *
  * Ordering: score DESC, id ASC on ties — callers pass the ROUNDED
  * score so ranking matches the cross-engine oracle exactly.
  * Output: array<struct<id long, score double>> best-first.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"topKByScore needs k >= 1, got $k")

  // PriorityQueue dequeues its MAX; rank elements so the max is the
  // WORST entry (lowest score, then highest id): by (-score, id).
  private val heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))))
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](heapOrdering)

  private def push(b: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (b.size < k) b.enqueue(e)
    else if (heapOrdering.lt(e, b.head)) { b.dequeue(); b.enqueue(e) }
  }

  override def update(
      b: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      push(b, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    b
  }

  override def merge(
      b: mutable.PriorityQueue[(Double, Long)],
      o: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    o.foreach(push(b, _))
    b
  }

  override def eval(b: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = b.toSeq.sortBy { case (s, id) => (-s, id) }
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(id, s)
    }.toArray[Any])
  }

  override def serialize(b: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => b.enqueue((in.readDouble(), in.readLong())))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  protected override def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
