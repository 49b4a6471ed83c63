package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst AGGREGATE function: bounded top-k per group.
  *
  * This is the scale replacement for window-function top-k
  * (`row_number().over(partitionBy(g).orderBy(score))` materializes and
  * sorts EVERY row of every group before discarding all but k): a
  * TypedImperativeAggregate carries at most k (score, id[, payload]) entries
  * per group through partial aggregation, so each map task ships ≤ k rows
  * per group into the shuffle and no per-group sort of the full input ever
  * happens. Completes the custom-operator spectrum next to the scalar
  * expression (CosineSimilarity), the optimizer rule and planner strategy
  * (GraftExtensions), and the physical plan (CosineTopKPlan).
  *
  * Ordering is (score DESC, id ASC) — or (score ASC, id ASC) when `asc` —
  * and is NaN-CONSISTENT with Spark's SortOrder semantics: NaN compares
  * greater than every double (java.lang.Double.compare), so a DESC heap
  * ranks NaN first and an ASC heap ranks it last, exactly like the window
  * formulation it replaces. Results are cross-engine deterministic.
  *
  * `payload` carries arbitrary extra columns through the heap as inert
  * cargo (ordering never looks at them), so top-N-per-group queries whose
  * projection needs more than (group, rank, score, id) — e.g. a part NAME
  * next to its price — still get the bounded plan. Entries serialize the
  * payload as an UnsafeRow; with no payload the wire format is the bare
  * (double, long) pair.
  *
  * Returns ARRAY<STRUCT<score: DOUBLE, id: BIGINT[, payload: STRUCT]>>
  * sorted best-first.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    asc: Boolean = false,
    payload: Seq[Expression] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, UnsafeRow)]] {

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

  private def payloadSchema: StructType =
    StructType(payload.zipWithIndex.map { case (e, i) =>
      StructField(s"p$i", e.dataType, e.nullable)
    })

  @transient private lazy val payloadProj: UnsafeProjection =
    UnsafeProjection.create(payload)

  // `compare(a, b) < 0` iff a ranks BETTER: score per direction with NaN
  // greatest (java.lang.Double.compare — byte-for-byte Spark's SortOrder
  // comparator for doubles), ties by id ASC. The max-heap head under this
  // ordering is therefore the WORST kept entry — the eviction candidate.
  private val bestFirst: Ordering[(Double, Long, UnsafeRow)] =
    new Ordering[(Double, Long, UnsafeRow)] {
      override def compare(a: (Double, Long, UnsafeRow),
                           b: (Double, Long, UnsafeRow)): Int = {
        val c =
          if (asc) java.lang.Double.compare(a._1, b._1)
          else java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, UnsafeRow)] =
    mutable.PriorityQueue.empty(bestFirst)

  override def update(buffer: mutable.PriorityQueue[(Double, Long, UnsafeRow)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long, UnsafeRow)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // copy: the projection's UnsafeRow is reused across input rows
      val p = if (payload.isEmpty) null else payloadProj(input).copy()
      offer(buffer, (s.asInstanceOf[Double], i.asInstanceOf[Long], p))
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Double, Long, UnsafeRow)],
                     other: mutable.PriorityQueue[(Double, Long, UnsafeRow)]): mutable.PriorityQueue[(Double, Long, UnsafeRow)] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  private def offer(buffer: mutable.PriorityQueue[(Double, Long, UnsafeRow)],
                    e: (Double, Long, UnsafeRow)): Unit = {
    if (buffer.size < k) buffer.enqueue(e)
    else if (bestFirst.compare(e, buffer.head) < 0) { buffer.dequeue(); buffer.enqueue(e) }
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long, UnsafeRow)]): Any = {
    val best = buffer.toArray.sorted(bestFirst)
    new GenericArrayData(best.map { case (s, i, p) =>
      if (payload.isEmpty) InternalRow(s, i) else InternalRow(s, i, p)
    })
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long, UnsafeRow)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (s, i, p) =>
      out.writeDouble(s); out.writeLong(i)
      if (payload.nonEmpty) {
        val bytes = p.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, UnsafeRow)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble()
      val i = in.readLong()
      val p = if (payload.isEmpty) null else {
        val len = in.readInt()
        val pb = new Array[Byte](len)
        in.readFully(pb)
        val row = new UnsafeRow(payload.length)
        row.pointTo(pb, len)
        row
      }
      buf.enqueue((s, i, p))
    }
    buf
  }

  override def dataType: DataType = {
    val base = new StructType().add("score", DoubleType).add("id", LongType)
    val entry = if (payload.isEmpty) base else base.add("payload", payloadSchema, nullable = false)
    ArrayType(entry, containsNull = false)
  }
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id) ++ payload
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren.drop(2))
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

  /** Column API with payload cargo: top-k (score, id, payload-struct)
    * entries per group. The payload rides through the heap untouched — the
    * bounded-plan answer to "top-N per group, but I also need these other
    * columns of the winning rows". */
  def topKWith(score: Column, id: Column, k: Int, payload: Column*): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("long")), k,
        payload = payload.map(ColumnBridge.expression))
        .toAggregateExpression())
}
