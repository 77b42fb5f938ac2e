package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the nearest-centroid pick that the whole
  * k-means / IVF / SemDeDup family runs per corpus row (q55 cell assignment,
  * q116 Lloyd-step assignment, q118's per-iteration assignment, q126's
  * semantic-cluster assignment).
  *
  * Replaces the `crossJoin(broadcast(K centroids))` + `row_number() OVER
  * (PARTITION BY vec_id ORDER BY dist2, cent_id)` formulation. That shape is
  * semantically right but plans an Exchange(hashpartitioning(vec_id)) + Sort
  * over K·n rows — after the broadcast join the data is NOT clustered by
  * vec_id, so Catalyst must shuffle the K-fold-expanded corpus to evaluate
  * the window (and for q118 it pays that per Lloyd iteration). Here the K
  * candidates are compared INSIDE one codegen'd projection — the argmin a
  * native engine would write — so the corpus truly never expands and never
  * shuffles for assignment; the only wide stage left in the k-means loop is
  * the (cluster, dim) re-estimation hash-aggregate.
  *
  * The centroid matrix rides along as one flattened `double[]` reference
  * object (the [[SignSketch]] pattern — NOT K literal arrays per row, which
  * is the measured JIT-poisoning shape its scaladoc documents). Collecting
  * the K centroid rows to the driver is what `broadcast()` did internally
  * anyway, so the scale envelope is unchanged: K bounded by driver/executor
  * memory, corpus unbounded. The production lever for huge K stays
  * hierarchical assignment (probe a coarse cell, refine inside — q55's own
  * machinery), not a wider flat scan.
  *
  * Bit-for-bit identical to the window formulation it replaces:
  *  - every dot product is the same sequential left-fold double accumulation
  *    [[DotProduct]] generates (`acc + v[i] * c[i]` ascending i);
  *  - per-candidate `dist2 = (v·v − 2·v·c) + c·c` in exactly the old
  *    Column-tree association; the centroid self-dots `c·c` are pre-folded
  *    once at construction with the identical loop, so their bits match the
  *    per-row fold the old plan evaluated;
  *  - candidates are scanned in ascending centroid-id order with a STRICT
  *    better-than test, so ties keep the lower id — the
  *    `ORDER BY dist2, cent_id` (or `ccos DESC, cent_id`) tie rule —
  *    including the NaN corner: Spark orders doubles nanSafely (NaN sorts
  *    LARGEST), so ascending-dist2 ranks NaN last (a finite candidate
  *    beats a NaN best) while descending-ccos ranks NaN FIRST (a NaN
  *    candidate beats a finite best); both orderings are replicated
  *    exactly rather than left to raw `<`/`>` (whose NaN comparisons are
  *    always false and would freeze whatever candidate came first);
  *  - `byCosine = true` ranks by `v·c / (norm · √(c·c))` (q55's cell metric)
  *    with the same division/multiplication order as the old Column tree.
  *
  * Returns a struct `(cluster, dist2, dvc, ccos)` for the winning centroid —
  * `dvc` = v·c so q126 can derive its centroid-cosine without a second pass.
  * NULL for a null/malformed vector (wrong length or null element): the old
  * plan gave every candidate a NULL dist2/ccos and the window then picked
  * cent_id order — indistinguishable on the NOT-NULL fixed-dim corpus, and
  * a loud NULL is the safer contract for a malformed row.
  */
case class NearestCentroid(vec: Expression, norm: Expression,
    ids: Array[Long], cents: Array[Array[Double]], byCosine: Boolean)
  extends BinaryExpression {
  require(ids.length == cents.length && ids.nonEmpty, "ids/cents must align")
  require(ids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "centroid ids must be strictly ascending (tie rule = lower id wins)")

  override def left: Expression = vec
  override def right: Expression = norm

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, norm.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires (ARRAY<DOUBLE>, DOUBLE), got $l / $r")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("dist2", DoubleType, nullable = false),
    StructField("dvc", DoubleType, nullable = false),
    StructField("ccos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private val dim = cents(0).length

  /** Flattened [k * dim + i] centroid components. */
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](cents.length * dim)
    var k = 0
    while (k < cents.length) {
      require(cents(k).length == dim, "ragged centroid matrix")
      System.arraycopy(cents(k), 0, out, k * dim, dim)
      k += 1
    }
    out
  }

  /** Pre-folded c·c per centroid — the same sequential fold [[DotProduct]]
    * runs, so bits match the old per-row evaluation. */
  @transient private lazy val selfDots: Array[Double] =
    cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc = acc + c(i) * c(i); i += 1 }
      acc
    }

  /** √(c·c) per centroid (the old plan's `sqrt(dot(cv, cv))` column). */
  @transient private lazy val selfNorms: Array[Double] = selfDots.map(math.sqrt)

  protected override def nullSafeEval(v: Any, n: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var i = 0
    var vv = 0.0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      vv = vv + x.getDouble(i) * x.getDouble(i)
      i += 1
    }
    val nv = n.asInstanceOf[Double]
    var best = -1; var bestKey = 0.0; var bestD2 = 0.0; var bestDvc = 0.0; var bestCcos = 0.0
    var k = 0
    while (k < ids.length) {
      var dvc = 0.0
      i = 0
      while (i < dim) { dvc = dvc + x.getDouble(i) * flat(k * dim + i); i += 1 }
      val d2 = (vv - 2.0 * dvc) + selfDots(k)
      val ccos = dvc / (nv * selfNorms(k))
      val key = if (byCosine) ccos else d2
      // nanSafe better-than (see scaladoc): asc treats NaN as +inf-most,
      // desc ranks NaN first — identical to the window ORDER BY
      val better =
        if (byCosine) key > bestKey || (key.isNaN && !bestKey.isNaN)
        else key < bestKey || (bestKey.isNaN && !key.isNaN)
      if (best < 0 || better) {
        best = k; bestKey = key; bestD2 = d2; bestDvc = dvc; bestCcos = ccos
      }
      k += 1
    }
    InternalRow(ids(best), bestD2, bestDvc, bestCcos)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cFlat = ctx.addReferenceObj("ncCents", flat, "double[]")
    val cIds = ctx.addReferenceObj("ncIds", ids, "long[]")
    val cSelf = ctx.addReferenceObj("ncSelfDots", selfDots, "double[]")
    val cNorms = ctx.addReferenceObj("ncSelfNorms", selfNorms, "double[]")
    val kN = ids.length
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val vv = ctx.freshName("vv"); val dvc = ctx.freshName("dvc")
      val d2 = ctx.freshName("d2"); val ccos = ctx.freshName("ccos")
      val key = ctx.freshName("key"); val ok = ctx.freshName("ok")
      val best = ctx.freshName("best"); val bestKey = ctx.freshName("bestKey")
      val bestD2 = ctx.freshName("bestD2"); val bestDvc = ctx.freshName("bestDvc")
      val bestCcos = ctx.freshName("bestCcos")
      val betterTest =
        if (byCosine)
          s"($key > $bestKey || (Double.isNaN($key) && !Double.isNaN($bestKey)))"
        else
          s"($key < $bestKey || (Double.isNaN($bestKey) && !Double.isNaN($key)))"
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |double $vv = 0.0;
         |for (int $i = 0; $ok && $i < $dim; $i++) {
         |  if ($v.isNullAt($i)) { $ok = false; }
         |  else { $vv = $vv + $v.getDouble($i) * $v.getDouble($i); }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = -1;
         |  double $bestKey = 0.0, $bestD2 = 0.0, $bestDvc = 0.0, $bestCcos = 0.0;
         |  for (int $k = 0; $k < $kN; $k++) {
         |    double $dvc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dvc = $dvc + $v.getDouble($i) * $cFlat[$k * $dim + $i];
         |    }
         |    double $d2 = ($vv - 2.0 * $dvc) + $cSelf[$k];
         |    double $ccos = $dvc / ($n * $cNorms[$k]);
         |    double $key = ${if (byCosine) ccos else d2};
         |    if ($best < 0 || $betterTest) {
         |      $best = $k; $bestKey = $key; $bestD2 = $d2;
         |      $bestDvc = $dvc; $bestCcos = $ccos;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $cIds[$best], $bestD2, $bestDvc, $bestCcos });
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(vec = newLeft, norm = newRight)
}

object NearestCentroid {
  /** `byCosine = false`: argmin squared-euclidean, ties to lower id (q116/
    * q118/q126). `norm` is only read by the cosine output field — pass the
    * row norm when the caller consumes `ccos`, else `lit(0.0)`. */
  def apply(v: Column, norm: Column, ids: Array[Long],
            cents: Array[Array[Double]], byCosine: Boolean): Column =
    GraftBridge.column(NearestCentroid(
      GraftBridge.expression(v), GraftBridge.expression(norm), ids, cents, byCosine))
}
