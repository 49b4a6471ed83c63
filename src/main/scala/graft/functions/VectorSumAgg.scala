package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of ARRAY<DOUBLE> values — the aggregation k-means
  * centroid recomputation needs (Σ vectors per cell, divided by the count
  * outside). A custom TypedImperativeAggregate keeps the reduction at one
  * fixed-size double[] buffer per group with map-side partial aggregation —
  * the alternative (posexplode to (dim, value) rows + groupBy) is exactly
  * the dim-explode shape the round-3 verdict retired from this codebase.
  * Null and length-mismatched inputs are skipped (counted by the caller if
  * it cares); an empty group evaluates to an empty array. */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum expects ARRAY<DOUBLE>, got $other")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buffer.isEmpty) {
      val fresh = new Array[Double](n)
      var i = 0
      while (i < n) { fresh(i) = arr.getDouble(i); i += 1 }
      fresh
    } else if (buffer.length == n) {
      var i = 0
      while (i < n) { buffer(i) += arr.getDouble(i); i += 1 }
      buffer
    } else buffer // length mismatch: skip the row
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] =
    if (buffer.isEmpty) other
    else if (other.isEmpty || other.length != buffer.length) buffer
    else {
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readDouble())
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "vector_sum"
}

object VectorSumAgg {
  def vectorSum(c: Column): Column =
    ColumnBridge.column(VectorSumAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
