package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable 48-bit content hash — the
  * single hottest scalar in the dedup/similarity path (evaluated once per
  * shingle/token: ~50× per document).
  *
  * Semantics are *identical* to the built-in composition in
  * [[PortableHash.h48]] (fold of the first 12 md5 hex digits, i.e. the first
  * 6 digest bytes big-endian — same value the DuckDB oracle computes), but in
  * one codegen'd call instead of an interpreted 12-step HOF fold over a
  * split-to-chars array. This is the SURVEY §7.3 escalation path (b): a
  * custom `Expression` with `doGenCode`, *only* where the built-in
  * composition is measurably hot; everything else in the engine stays on
  * built-ins.
  */
case class H48(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"h48 requires STRING input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "h48"

  protected override def nullSafeEval(input: Any): Any =
    H48.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H48.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): H48 =
    copy(child = newChild)
}

object H48 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Per-thread digest instance, shared with [[ShingleHashes.compute]]. */
  private[functions] def threadDigest(): java.security.MessageDigest = digest.get()

  /** First 6 md5 bytes, big-endian (== fold of the first 12 hex digits). */
  def hash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  def apply(c: Column): Column = GraftBridge.column(H48(GraftBridge.expression(c)))
}
