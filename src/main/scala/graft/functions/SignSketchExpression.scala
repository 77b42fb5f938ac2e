package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the banded random-hyperplane (sign-LSH)
  * sketch: `bands` packed band values, bit `j` of band `b` = sign of the
  * dot product of the input vector with the ±1 hyperplane
  * `prefix:(b*bandBits+j)` (md5-parity weights, reproducible anywhere md5
  * exists — the same derivation `SimilarityOps.planeWeights` uses).
  *
  * This replaces the composed-Column formulation (one `DotProduct` against
  * an `array(lit...)` of 64 doubles PER PLANE — 96 expressions × 64
  * literals for the banded sketch). That shape is semantically fine but a
  * codegen bomb: the generated projection method carries thousands of
  * constants, compiles slowly, and its C2 compilation is pathological
  * enough to starve the JIT for the REST of the session — measured at sf1
  * (50k docs), q41 ran in 34 s but left the next query (q36, an unrelated
  * 64-aggregate MinHash pipeline) running 250-420 s vs 17-28 s in a clean
  * JVM. Here the weights ride along as ONE flattened `double[]` reference
  * object and the loop is ~20 bytecodes, so the method JITs like any other.
  *
  * Bit-for-bit identical to the composed form: the per-plane dot is the
  * same left-to-right IEEE-754 fold (±1.0 weights make each term exact),
  * the sign test is `!(acc < 0)` — NOT the raw Java `acc >= 0` — so a NaN
  * accumulator sets the bit, matching Spark's `nanSafeCompareDoubles`
  * ordering (NaN sorts above every double, so `NaN >= 0` is TRUE in the
  * composed `Column` form and in the DuckDB oracle), and a malformed
  * vector (wrong length / null element) contributes 0-bits exactly like
  * the old `when(null >= 0, …).otherwise(0)` collapse. Value identity is
  * property-tested against the composed formulation in PortableHashSpec.
  */
case class SignSketch(child: Expression, prefix: String, bands: Int,
                      bandBits: Int, dim: Int) extends UnaryExpression {
  require(bandBits <= 63, "band values are packed into signed longs")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_sketch requires ARRAY<DOUBLE> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_sketch"

  /** Flattened [plane * dim + i] ±1.0 weights. */
  @transient private lazy val weights: Array[Double] =
    SignSketch.weights(prefix, bands * bandBits, dim)

  protected override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    val planes = bands * bandBits
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var ok = x.numElements() == dim
      var i = 0
      while (ok && i < dim) {
        if (x.isNullAt(i)) ok = false
        else { acc = acc + x.getDouble(i) * weights(p * dim + i); i += 1 }
      }
      if (ok && !(acc < 0)) out(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("signSketchWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val ok = ctx.freshName("ok")
      s"""
         |long[] $out = new long[$bands];
         |for (int $p = 0; $p < ${bands * bandBits}; $p++) {
         |  double $acc = 0.0;
         |  boolean $ok = $v.numElements() == $dim;
         |  for (int $i = 0; $ok && $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $ok = false; }
         |    else { $acc = $acc + $v.getDouble($i) * $w[$p * $dim + $i]; }
         |  }
         |  if ($ok && !($acc < 0)) { $out[$p / $bandBits] |= 1L << ($p % $bandBits); }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignSketch =
    copy(child = newChild)
}

object SignSketch {
  /** ±1.0 weight for plane `p`, position `i`: md5("prefix:p:i") first-byte
    * parity — identical to `SimilarityOps.planeWeights`/`bandPlaneWeightsFor`.
    */
  def weights(prefix: String, planes: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var i = 0
      while (i < dim) {
        val h = md.digest(s"$prefix:$p:$i".getBytes("UTF-8"))
        out(p * dim + i) = (java.lang.Byte.toUnsignedInt(h(0)) % 2) * 2 - 1
        i += 1
      }
      p += 1
    }
    out
  }

  def apply(v: Column, prefix: String, bands: Int, bandBits: Int, dim: Int): Column =
    GraftBridge.column(SignSketch(GraftBridge.expression(v), prefix, bands, bandBits, dim))
}
