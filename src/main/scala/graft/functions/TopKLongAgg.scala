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

/** [[TopKAgg]]'s LONG-score sibling: bounded top-k per group ordered by an
  * integer key, EXACT over the full 64-bit range.
  *
  * TopKAgg scores are doubles — fine for similarity/IDF-style ranks, but a
  * composite integer order key (top-k by `(doc_id, sent_id)`, "first k
  * events per key by (ts, seq)") would have to ride the double lane and is
  * only exact while the major key fits 2^53. This aggregate keeps the score
  * a BIGINT end to end (java.lang.Long.compare — byte-for-byte Spark's
  * SortOrder comparator for longs), so `row_number() over (partition by g
  * order by s [ASC|DESC], id ASC) <= k` on integer keys rewrites to a
  * bounded heap with row-identical results at ANY magnitude. Same partial-
  * aggregation contract, payload cargo, and wire format as TopKAgg, with
  * longs in the score slot.
  *
  * Returns ARRAY<STRUCT<score: BIGINT, id: BIGINT[, payload: STRUCT]>>
  * sorted best-first.
  */
case class TopKLongAgg(
    score: Expression,
    id: Expression,
    k: Int,
    asc: Boolean = false,
    payload: Seq[Expression] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long, UnsafeRow)]] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == LongType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k_long_agg expects (BIGINT score, BIGINT id), got (${score.dataType}, ${id.dataType})")

  private def payloadSchema: StructType =
    StructType(payload.zipWithIndex.map { case (e, i) =>
      StructField(s"p$i", e.dataType, e.nullable)
    })

  @transient private lazy val payloadProj: UnsafeProjection =
    UnsafeProjection.create(payload)

  /** `compare(a, b) < 0` iff a ranks BETTER: score per direction, ties by
    * id ASC. The max-heap head under this ordering is the WORST kept entry. */
  private val bestFirst: Ordering[(Long, Long, UnsafeRow)] =
    new Ordering[(Long, Long, UnsafeRow)] {
      override def compare(a: (Long, Long, UnsafeRow),
                           b: (Long, Long, UnsafeRow)): Int = {
        val c =
          if (asc) java.lang.Long.compare(a._1, b._1)
          else java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long, UnsafeRow)] =
    mutable.PriorityQueue.empty(bestFirst)

  override def update(buffer: mutable.PriorityQueue[(Long, Long, UnsafeRow)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long, UnsafeRow)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = if (payload.isEmpty) null else payloadProj(input).copy()
      offer(buffer, (s.asInstanceOf[Long], i.asInstanceOf[Long], p))
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Long, Long, UnsafeRow)],
                     other: mutable.PriorityQueue[(Long, Long, UnsafeRow)]): mutable.PriorityQueue[(Long, Long, UnsafeRow)] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  private def offer(buffer: mutable.PriorityQueue[(Long, Long, UnsafeRow)],
                    e: (Long, Long, UnsafeRow)): Unit = {
    if (buffer.size < k) buffer.enqueue(e)
    else if (bestFirst.compare(e, buffer.head) < 0) { buffer.dequeue(); buffer.enqueue(e) }
  }

  override def eval(buffer: mutable.PriorityQueue[(Long, Long, UnsafeRow)]): Any = {
    val best = buffer.toArray.sorted(bestFirst)
    new GenericArrayData(best.map { case (s, i, p) =>
      if (payload.isEmpty) InternalRow(s, i) else InternalRow(s, i, p)
    })
  }

  override def serialize(buffer: mutable.PriorityQueue[(Long, Long, UnsafeRow)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (s, i, p) =>
      out.writeLong(s); out.writeLong(i)
      if (payload.nonEmpty) {
        val bytes = p.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long, UnsafeRow)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readLong()
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
    val base = new StructType().add("score", LongType).add("id", LongType)
    val entry = if (payload.isEmpty) base else base.add("payload", payloadSchema, nullable = false)
    ArrayType(entry, containsNull = false)
  }
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id) ++ payload
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKLongAgg =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren.drop(2))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "top_k_long_agg"
}

object TopKLongAgg {
  /** Column API: top-k (score, id) by integer score, best-first. */
  def topK(score: Column, id: Column, k: Int, asc: Boolean = false): Column =
    ColumnBridge.column(
      TopKLongAgg(ColumnBridge.expression(score.cast("long")),
        ColumnBridge.expression(id.cast("long")), k, asc = asc)
        .toAggregateExpression())
}
