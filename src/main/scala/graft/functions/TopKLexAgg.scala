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

/** [[TopKLongAgg]] generalized to a LEXICOGRAPHIC composite of n integer
  * sort keys: bounded top-k per group ordered by (s0, s1, ..., s{n-1}) —
  * all per the shared direction flag — with id ASC as the final tiebreak.
  *
  * This is the bounded-plan form of the multi-key rank window
  * `row_number() over (partition by g order by k1 ASC, k2 ASC, id ASC) <= k`
  * that concept_pair_sentences used to express by hand-placing its minor
  * key in the heap's id slot. An n-key heap beats bit-packing the keys into
  * one long (the other way to serve this shape): packing is only exact
  * when the key ranges are known to fit their lanes, while the composite
  * comparator is exact over the full 64-bit range of EVERY key, at any
  * arity. Each comparison is java.lang.Long.compare per lane —
  * byte-for-byte Spark's SortOrder comparator for longs — so results are
  * row-identical to the window formulation. Same partial-aggregation
  * contract, payload cargo, and wire format family as TopKAgg/TopKLongAgg.
  *
  * Returns ARRAY<STRUCT<s0: BIGINT, ..., s{n-1}: BIGINT, id: BIGINT
  * [, payload: STRUCT]>> sorted best-first.
  */
case class TopKLexAgg(
    scores: Seq[Expression],
    id: Expression,
    k: Int,
    asc: Boolean = false,
    payload: Seq[Expression] = Nil,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)]] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (scores.nonEmpty && scores.forall(_.dataType == LongType) && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k_lex_agg expects (BIGINT scores..., BIGINT id), got " +
        s"(${scores.map(_.dataType).mkString(",")}; ${id.dataType})")

  private def payloadSchema: StructType =
    StructType(payload.zipWithIndex.map { case (e, i) =>
      StructField(s"p$i", e.dataType, e.nullable)
    })

  @transient private lazy val payloadProj: UnsafeProjection =
    UnsafeProjection.create(payload)

  /** `compare(a, b) < 0` iff a ranks BETTER: lanes left to right per the
    * shared direction, final tiebreak id ASC. The max-heap head under this
    * ordering is the WORST kept entry — the eviction candidate. */
  private val bestFirst: Ordering[(Array[Long], Long, UnsafeRow)] =
    new Ordering[(Array[Long], Long, UnsafeRow)] {
      override def compare(a: (Array[Long], Long, UnsafeRow),
                           b: (Array[Long], Long, UnsafeRow)): Int = {
        var i = 0
        while (i < a._1.length) {
          val c =
            if (asc) java.lang.Long.compare(a._1(i), b._1(i))
            else java.lang.Long.compare(b._1(i), a._1(i))
          if (c != 0) return c
          i += 1
        }
        java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)] =
    mutable.PriorityQueue.empty(bestFirst)

  override def update(buffer: mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)],
                      input: InternalRow): mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)] = {
    val i = id.eval(input)
    if (i != null) {
      val ss = new Array[Long](scores.length)
      var j = 0
      var allSet = true
      while (j < scores.length && allSet) {
        val s = scores(j).eval(input)
        if (s == null) allSet = false else ss(j) = s.asInstanceOf[Long]
        j += 1
      }
      if (allSet) {
        // copy: the projection's UnsafeRow is reused across input rows
        val p = if (payload.isEmpty) null else payloadProj(input).copy()
        offer(buffer, (ss, i.asInstanceOf[Long], p))
      }
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)],
                     other: mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)]): mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  private def offer(buffer: mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)],
                    e: (Array[Long], Long, UnsafeRow)): Unit = {
    if (buffer.size < k) buffer.enqueue(e)
    else if (bestFirst.compare(e, buffer.head) < 0) { buffer.dequeue(); buffer.enqueue(e) }
  }

  override def eval(buffer: mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)]): Any = {
    val best = buffer.toArray.sorted(bestFirst)
    new GenericArrayData(best.map { case (ss, i, p) =>
      val fields = ss.map(_.asInstanceOf[Any]) ++ Array[Any](i) ++
        (if (payload.isEmpty) Array.empty[Any] else Array[Any](p))
      InternalRow.fromSeq(fields.toIndexedSeq)
    })
  }

  override def serialize(buffer: mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (ss, i, p) =>
      ss.foreach(out.writeLong)
      out.writeLong(i)
      if (payload.nonEmpty) {
        val bytes = p.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Array[Long], Long, UnsafeRow)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val ss = Array.fill(scores.length)(in.readLong())
      val i = in.readLong()
      val p = if (payload.isEmpty) null else {
        val len = in.readInt()
        val pb = new Array[Byte](len)
        in.readFully(pb)
        val row = new UnsafeRow(payload.length)
        row.pointTo(pb, len)
        row
      }
      buf.enqueue((ss, i, p))
    }
    buf
  }

  override def dataType: DataType = {
    val base = scores.indices.foldLeft(new StructType()) { (st, i) =>
      st.add(s"s$i", LongType)
    }.add("id", LongType)
    val entry = if (payload.isEmpty) base else base.add("payload", payloadSchema, nullable = false)
    ArrayType(entry, containsNull = false)
  }
  override def nullable: Boolean = false
  override def children: Seq[Expression] = scores ++ Seq(id) ++ payload
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKLexAgg =
    copy(scores = newChildren.take(scores.length),
      id = newChildren(scores.length), payload = newChildren.drop(scores.length + 1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLexAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLexAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "top_k_lex_agg"
}

object TopKLexAgg {
  /** Column API: top-k entries per group by the lexicographic composite
    * (scores..., id ASC), best-first per `asc`. */
  def topK(scores: Seq[Column], id: Column, k: Int, asc: Boolean = false): Column =
    ColumnBridge.column(
      TopKLexAgg(scores.map(s => ColumnBridge.expression(s.cast("long"))),
        ColumnBridge.expression(id.cast("long")), k, asc = asc)
        .toAggregateExpression())
}
