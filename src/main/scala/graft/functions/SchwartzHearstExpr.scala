package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel the generated code calls: Schwartz–Hearst pairs as
  * Catalyst array-of-struct data. (The algorithm itself lives in
  * graft.operators.Abbreviations — public PSB 2003 reimplementation.) */
object SchwartzHearstKernel {
  def pairs(text: UTF8String): ArrayData = {
    val found = graft.operators.Abbreviations.schwartzHearst(text.toString)
    new GenericArrayData(found.map { case (sf, lf) =>
      InternalRow(UTF8String.fromString(sf), UTF8String.fromString(lf))
    }.toArray[Any])
  }
}

/** ARRAY<STRUCT<short_form, long_form>> of Schwartz–Hearst abbreviation
  * pairs — a native expression rather than a Scala UDF, so the detector
  * stays inside whole-stage codegen with no per-row serialization boundary
  * and no Catalyst black box (round-3 advice: the last remaining UDF).
  * The genuinely procedural scan runs in one static call per row, same
  * pattern as [[DecodeXmlEntities]]. */
case class SchwartzHearstPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"schwartz_hearst_pairs expects STRING, got $other")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("short_form", StringType, nullable = false),
      StructField("long_form", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "schwartz_hearst_pairs"

  override def nullSafeEval(input: Any): Any =
    SchwartzHearstKernel.pairs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SchwartzHearstKernel.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): SchwartzHearstPairs =
    copy(child = newChild)
}

object SchwartzHearstPairs {
  def pairsOf(text: Column): Column =
    ColumnBridge.column(SchwartzHearstPairs(ColumnBridge.expression(text)))
}
