package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst AGGREGATE function: bounded top-k per group.
  *
  * This is the scale replacement for window-function top-k
  * (`row_number().over(partitionBy(g).orderBy(score))` materializes and
  * sorts EVERY row of every group before discarding all but k): a
  * TypedImperativeAggregate carries at most k (score, id) pairs per group
  * through partial aggregation, so each map task ships ≤ k rows per group
  * into the shuffle and no per-group sort of the full input ever happens.
  * Completes the custom-operator spectrum next to the scalar expression
  * (CosineSimilarity), the optimizer rule and planner strategy
  * (GraftExtensions), and the physical plan (CosineTopKPlan).
  *
  * Ordering is (score DESC, id ASC) — identical to the window formulation
  * and the oracle, so results are cross-engine deterministic. Returns
  * ARRAY<STRUCT<score: DOUBLE, id: BIGINT>> sorted best-first.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // analysis-time contract: update() reads score as Double and id as Long.
  // (AbstractDataType is private[sql] in Spark 4, so ExpectsInputTypes is
  // closed to third parties; the explicit check gives the same analysis-time
  // rejection instead of a mid-task ClassCastException, and the Column API
  // coerces compatible inputs by casting.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k_agg expects (DOUBLE score, BIGINT id), got (${score.dataType}, ${id.dataType})")

  // eviction heap: head = worst kept entry (lowest score; ties broken so
  // the LARGER id is worse, matching ORDER BY score DESC, id ASC)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buffer: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      offer(buffer, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  private def offer(buffer: mutable.PriorityQueue[(Double, Long)],
                    e: (Double, Long)): Unit = {
    if (buffer.size < k) buffer.enqueue(e)
    else if (worstFirst.compare(e, buffer.head) < 0) { buffer.dequeue(); buffer.enqueue(e) }
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buffer.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(best.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType =
    ArrayType(new StructType().add("score", DoubleType).add("id", LongType), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "top_k_agg"
}

object TopKAgg {
  /** Column API: top-k (score, id) pairs per group, best-first. Compatible
    * inputs (int/float score, int id) are coerced by the casts; incompatible
    * ones fail analysis in checkInputDataTypes. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}
