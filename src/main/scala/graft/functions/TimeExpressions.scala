package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

import graft.core.CfCalendar

/** `cf_num2date(num, 'days since 2000-01-01', '360_day')` — the CF
  * non-standard-calendar decode ([[graft.core.CfCalendar]], the
  * cftime.num2date semantics of reference aggregation.py:193-196) as a
  * native codegen'd expression returning `array<bigint>` of
  * `[year, month, day, hour, minute, second, microsecond]`.
  *
  * units/calendar are required to be LITERALS: they parse once at plan
  * build into a [[CfCalendar.PartsKernel]]; the generated loop body is
  * one call into exact integer divisions — no string handling, no object
  * churn beyond the 7-element result (scalar alternatives would need six
  * expressions re-deriving the same divmods; time axes are
  * metadata-sized anyway, and the long-view path that uses this per ROW
  * stays inside the surrounding whole-stage codegen). */
case class CfNum2Date(child: Expression, units: String, calendar: String)
    extends UnaryExpression {

  // fail at BUILD time on a bad units/calendar string, not per row
  @transient private lazy val kernel = new CfCalendar.PartsKernel(units, calendar)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integer step count, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cf_num2date"

  private def asLong(a: Any): Long = a match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override protected def nullSafeEval(a: Any): Any =
    new GenericArrayData(kernel.parts(asLong(a)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("cfKernel", kernel,
      classOf[CfCalendar.PartsKernel].getName)
    nullSafeCodeGen(ctx, ev, num =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$k.parts((long) $num));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
