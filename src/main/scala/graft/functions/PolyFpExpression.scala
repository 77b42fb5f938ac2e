package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling polynomial document
  * fingerprint (q33): fold acc·31 + byte mod 1e9+7 over the pre-normalized
  * ASCII text — the Rabin–Karp content key, previously an interpreted
  * per-character HOF fold over a `split(s, "")` array (CodegenFallback, one
  * boxed element per character over multi-hundred-char documents).
  *
  * Value-identical to [[PortableHash.polyFingerprintBuiltin]] and to the
  * DuckDB oracle's `list_reduce` rendition for the normalized `[a-z0-9 ]`
  * domain the fingerprint runs on (every byte is one character, and
  * `ascii(c)` is the byte value). Same escalation rule as [[H48]] /
  * [[DotProduct]]: a custom codegen'd `Expression` only where the built-in
  * composition is measurably interpreted-hot.
  */
case class PolyFp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"poly_fp requires STRING input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fp"

  protected override def nullSafeEval(input: Any): Any =
    PolyFp.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyFp.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PolyFp =
    copy(child = newChild)
}

object PolyFp {
  /** Fold acc·31 + byte mod MFp — every intermediate < 31·MFp + 255 ≪ 2^63. */
  def hash(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xffL)) % PortableHash.MFp
      i += 1
    }
    acc
  }

  def apply(c: Column): Column = GraftBridge.column(PolyFp(GraftBridge.expression(c)))
}
