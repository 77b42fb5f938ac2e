package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Membership test of a LONG column against a driver-collected sorted
  * array, binary-searched per row. The plan-size-safe alternative to
  * `isInCollection` for lists in the thousands-to-millions range: the
  * values ride into codegen as ONE shared reference object instead of a
  * per-value literal forest (which the analyzer walks on every plan copy),
  * and executors share the array via the task closure — the same
  * distribution shape as a broadcast hash set, without a join.
  *
  * Callers own the "small by construction" argument for the array (e.g. a
  * capped-df hot list is ≤ |keys|/cap entries).
  */
case class InSortedLongs(child: Expression, values: Array[Long])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"in_sorted_longs requires BIGINT input, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_sorted_longs"

  protected override def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(values, input.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("inSortedValues", values, "long[]")
    defineCodeGen(ctx, ev, c => s"(java.util.Arrays.binarySearch($ref, $c) >= 0)")
  }

  override protected def withNewChildInternal(newChild: Expression): InSortedLongs =
    copy(child = newChild)
}

object InSortedLongs {
  /** `values` MUST be sorted ascending (callers typically `.sorted` a
    * driver-side collect). */
  def apply(c: Column, values: Array[Long]): Column =
    GraftBridge.column(InSortedLongs(GraftBridge.expression(c), values))
}
