package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: deflate(level 6) size over UTF-8 size. Deterministic per
  * zlib implementation: DEFLATE output size at a given level is NOT pinned
  * by the spec, and a JDK Deflater may link platform zlib or zlib-ng, so
  * the ratio is run-to-run stable on one machine but not comparable across
  * differently-linked JVMs. The oracle therefore never recomputes this
  * number — it is staged once and only the gate derivation is compared
  * (TextStats.compressionQualityStaged); the number itself is spec-pinned. */
object CompressionKernel {
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      // floor(x*1e6+0.5)/1e6 — the suite's cross-engine rounding grain
      math.floor(total.toDouble / bytes.length * 1e6 + 0.5) / 1e6
    } finally d.end()
  }
}

/** DOUBLE — deflate-compressed size / raw size of a string (6dp).
  *
  * The compression-ratio quality signal from large-scale corpus filtering
  * (Gopher / RefinedWeb lineage): highly repetitive or templated text
  * compresses far below normal prose, near-random noise barely compresses
  * at all; both tails are worth dropping from training data. DuckDB has no
  * deflate, so the driver check for queries built on this is rows-only and
  * the numeric behavior is spec-pinned instead. */
case class CompressionRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"compression_ratio expects STRING, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  override def nullSafeEval(input: Any): Any =
    CompressionKernel.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressionKernel.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object CompressionRatio {
  def compressionRatio(c: Column): Column =
    ColumnBridge.column(CompressionRatio(ColumnBridge.expression(c)))
}
