package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for hashed-feature linear-model inference —
  * the fastText-style quality-classifier forward pass (Joulin et al. 2016;
  * the CCNet→C4→DCLM corpus-pipeline lineage) that production training-data
  * pipelines run as their main learned quality gate, complementing q30's
  * heuristic score.
  *
  * For a token array t, returns Σᵢ w[h48(tᵢ) mod |w|] — the integer
  * pre-bias logit. The weight vector rides the expression as a REFERENCE
  * OBJECT (the SignSketch lesson: a 4096-element literal tree would poison
  * the JIT and break codegen; `ctx.addReferenceObj` ships the model to
  * executors once per task like a broadcast). That makes inference a
  * NARROW per-row projection: no explode, no join, no shuffle — each
  * executor scores straight off the scan, which is the only shape that
  * works when the corpus is 100 TB and the model is KBs.
  *
  * Integer-quantized weights + integer sum ⇒ the logit is EXACT, so the
  * keep/drop verdict is bit-identical in the DuckDB oracle (which recomputes
  * the same weights from the generator formula — see
  * [[graft.operators.TextOps.qcWeights]]) and independent of partition
  * order. The sigmoid is monotone, so gating on the raw logit at 0 is
  * gating the probability at 0.5 — no transcendental ever computed.
  */
case class HashedLinearScore(child: Expression, weights: Array[Long])
  extends UnaryExpression {
  require(weights.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_linear_score requires ARRAY<STRING> input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_linear_score"

  protected override def nullSafeEval(input: Any): Any =
    HashedLinearScore.compute(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("qcWeights", weights, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashedLinearScore.compute($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object HashedLinearScore {
  /** Hash-bucket each token into the weight table and fold the integer sum. */
  def compute(toks: ArrayData, w: Array[Long]): Long = {
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = H48.hash(toks.getUTF8String(i).getBytes)
        sum += w((h % w.length).toInt)
      }
      i += 1
    }
    sum
  }

  def apply(c: Column, weights: Array[Long]): Column =
    GraftBridge.column(HashedLinearScore(GraftBridge.expression(c), weights))
}

/** [[HashedLinearScore]] over PRE-BUCKETED features: the input array already
  * holds bucket indices in [0, |w|), so scoring is a pure table lookup with
  * no hashing. The q153 TRAINING loop needs this split: the md5-derived
  * bucketing runs ONCE over the corpus into a compact integer-feature
  * intermediate, and each of the [[graft.operators.TextOps.QtIters]] GD
  * passes then scores off it — the classic featurize-once / iterate-cheap
  * shape of every multi-epoch trainer (re-hashing every token every pass
  * measured 4× the whole query's cost at sf0.1). Identity with the hashing
  * form, `BucketLinearScore(transform(toks, h48(t) % |w|), w) ≡
  * HashedLinearScore(toks, w)`, is pinned in CorpusOpsSpec.
  */
case class BucketLinearScore(child: Expression, weights: Array[Long])
  extends UnaryExpression {
  require(weights.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket_linear_score requires ARRAY<BIGINT> input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_linear_score"

  protected override def nullSafeEval(input: Any): Any =
    BucketLinearScore.compute(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("qcWeights", weights, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BucketLinearScore.compute($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketLinearScore =
    copy(child = newChild)
}

object BucketLinearScore {
  /** Fold the integer weight sum over pre-computed bucket indices. */
  def compute(buckets: ArrayData, w: Array[Long]): Long = {
    val n = buckets.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!buckets.isNullAt(i)) sum += w(buckets.getLong(i).toInt)
      i += 1
    }
    sum
  }

  def apply(c: Column, weights: Array[Long]): Column =
    GraftBridge.column(BucketLinearScore(GraftBridge.expression(c), weights))
}
