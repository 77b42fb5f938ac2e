package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Product-quantization primitives (q125): the codebook — M subspaces ×
  * K centroids × L integer components — is a driver-built constant a few KB
  * large, shipped to executors as ONE codegen reference object (the
  * [[MinHashSigCapped]]/[[SignSketch]] distribution shape: task-closure
  * broadcast, no join). All arithmetic is exact int64 — assignment
  * distances and ADC dots are integers, so ranking is engine-exact and the
  * DuckDB oracle replays the identical computation from the same quantized
  * components.
  *
  * [[PqEncode]]: int8-quantized vector (length M·L) → M code ids, each the
  * L2-argmin centroid of its subspace (ties → smallest centroid id).
  * [[PqAdcDot]]: quantized QUERY vector × corpus CODES → the dot product of
  * the query with the codebook-reconstructed corpus vector — the
  * distance-table lookup shape every PQ index serves at scale, where the
  * corpus stores M bytes per vector instead of 4·M·L.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Long]]])
  extends UnaryExpression {
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<BIGINT> input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  protected override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "long[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqEncode.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def compute(qv: ArrayData, cb: Array[Array[Array[Long]]]): GenericArrayData = {
    val m = cb.length
    val l = cb(0)(0).length
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      var best = 0L
      var bestD = Long.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d2 = 0L
        var d = 0
        while (d < l) {
          val diff = qv.getLong(s * l + d) - c(d)
          d2 += diff * diff
          d += 1
        }
        // strict < keeps the SMALLEST centroid id on ties — mirrored by the
        // oracle's (d2, cid) row_number tie-break
        if (d2 < bestD) { bestD = d2; best = j.toLong }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, codebook: Array[Array[Array[Long]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(c), codebook))
}

/** See [[PqEncode]]. Left = quantized query vector (M·L longs), right =
  * corpus codes (M longs); result = Σ_m Σ_d q[m·L+d] · cb[m][code_m][d]. */
case class PqAdcDot(left: Expression, right: Expression,
    codebook: Array[Array[Array[Long]]]) extends BinaryExpression {
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dot requires ARRAY<BIGINT> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    PqAdcDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "long[][][]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqAdcDot.compute($a, $b, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDot = copy(left = newLeft, right = newRight)
}

object PqAdcDot {
  def compute(qv: ArrayData, codes: ArrayData, cb: Array[Array[Array[Long]]]): Long = {
    val m = cb.length
    val l = cb(0)(0).length
    var acc = 0L
    var s = 0
    while (s < m) {
      val c = cb(s)(codes.getLong(s).toInt)
      var d = 0
      while (d < l) {
        acc += qv.getLong(s * l + d) * c(d)
        d += 1
      }
      s += 1
    }
    acc
  }

  def apply(a: Column, b: Column, codebook: Array[Array[Array[Long]]]): Column =
    GraftBridge.column(PqAdcDot(GraftBridge.expression(a), GraftBridge.expression(b), codebook))
}
