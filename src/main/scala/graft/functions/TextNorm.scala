package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: Unicode NFC → locale-free lowercase → accent strip
  * (NFD, drop combining marks, recompose). The canonical text-normalization
  * step multilingual corpus ingest runs before dedup/matching so that
  * `Café`, `café` and `café` all land on `cafe`. Matches DuckDB's
  * `strip_accents(lower(nfc_normalize(x)))` on decomposable Latin input. */
object TextNormKernel {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")
  def normalize(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val str = s.toString
    // fast path: pure ASCII needs only the lowercase
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return UTF8String.fromString(str.toLowerCase(java.util.Locale.ROOT))
    val nfc = Normalizer.normalize(str, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val nfd = Normalizer.normalize(lower, Normalizer.Form.NFD)
    val stripped = Marks.matcher(nfd).replaceAll("")
    UTF8String.fromString(Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }
}

/** STRING — normalized text (codegen'd single static call per row, the
  * [[DecodeXmlEntities]] pattern). */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects STRING, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    TextNormKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormKernel.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def normalizeText(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
}
