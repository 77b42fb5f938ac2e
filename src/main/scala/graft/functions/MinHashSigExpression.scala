package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's full MinHash signature
  * in ONE pass: for permutation j of `perms`, the minimum of
  * `(a_j·h + b_j) mod M31` over the document's hashed word-n-gram shingles
  * (the [[ShingleHashes]] scan feeding [[PortableHash.permuted]]'s exact
  * arithmetic — min over the shingle multiset equals min over the distinct
  * set, so values are identical to the batch `groupBy(doc).agg(min…×64)`
  * formulation; property-tested in PortableHashSpec).
  *
  * Why it matters at scale: the aggregate formulation shuffles the exploded
  * (doc, shingle) rows to compute signatures. This expression makes the
  * signature a NARROW per-row projection — no explode, no shuffle, each
  * executor emits (doc_id, sig[64]) straight off the scan. That is the shape
  * a 100 TB corpus needs (signatures are embarrassingly parallel; only band
  * buckets ever shuffle), and it is the only formulation available to a
  * STATELESS streaming stage (q112): an append-mode stream cannot run a
  * blocking groupBy, but it can evaluate a per-row expression.
  *
  * A document with fewer than `n` tokens has no shingles and yields an
  * empty array (callers filter on `size(sig) > 0`), mirroring how such
  * documents simply have no rows in the exploded batch pipeline.
  */
case class MinHashSig(child: Expression, n: Int, mod: Long, perms: Int)
  extends UnaryExpression {
  require(n >= 1 && mod > 1 && perms >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], n, mod, perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.compute($c, $n, ${mod}L, $perms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** [[MinHashSig]] with a hot-shingle exclusion set: shingles whose hash is
  * in `exclude` (sorted ascending; binary-searched per shingle, once — not
  * per permutation) are skipped before the min loops, so the signature is
  * that of the CAPPED shingle set. This keeps the boilerplate-capped
  * pipeline (q102) on the same zero-shuffle narrow-projection shape as the
  * uncapped one: the hot list is collected once driver-side (tiny by
  * construction — at most |distinct shingles|/cap entries, the exact
  * population the capped pipeline already broadcast for its anti-join) and
  * rides into codegen as one shared reference object.
  *
  * A document whose every shingle is hot yields an empty array — the same
  * outcome as its rows all dropping out of the anti-joined aggregate form.
  */
case class MinHashSigCapped(child: Expression, n: Int, mod: Long, perms: Int,
    exclude: Array[Long]) extends UnaryExpression {
  require(n >= 1 && mod > 1 && perms >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_capped requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_capped"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.computeCapped(input.asInstanceOf[UTF8String], n, mod, perms, exclude)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExclude", exclude, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.computeCapped($c, $n, ${mod}L, $perms, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigCapped =
    copy(child = newChild)
}

object MinHashSig {

  /** One-pass signature: shingle scan reused from [[ShingleHashes.compute]],
    * then a tight perms×shingles min loop. `a_j·h` stays below 2^62
    * (both factors < 2^31), so the long arithmetic never overflows —
    * the same bound the composed Column form relies on.
    */
  def compute(s: UTF8String, n: Int, mod: Long, perms: Int): GenericArrayData = {
    val sh = ShingleHashes.compute(s, n, mod)
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    minsOf(sh, m, mod, perms)
  }

  /** Capped variant: drop excluded shingles once up front, then the same
    * min loops. Min over the surviving multiset equals min over the
    * surviving distinct set — the aggregate-form equivalence is unchanged
    * by the cap.
    */
  def computeCapped(s: UTF8String, n: Int, mod: Long, perms: Int,
      exclude: Array[Long]): GenericArrayData = {
    val sh = ShingleHashes.compute(s, n, mod)
    val m = sh.numElements()
    val kept = new Array[Long](m)
    var k = 0
    var i = 0
    while (i < m) {
      val h = sh.getLong(i)
      if (java.util.Arrays.binarySearch(exclude, h) < 0) { kept(k) = h; k += 1 }
      i += 1
    }
    if (k == 0) return new GenericArrayData(Array.emptyLongArray)
    minsOf(new GenericArrayData(java.util.Arrays.copyOf(kept, k)), k, mod, perms)
  }

  private def minsOf(sh: GenericArrayData, m: Int, mod: Long, perms: Int): GenericArrayData = {
    val out = new Array[Long](perms)
    var j = 0
    while (j < perms) {
      val a = (j * 2654435761L) % (mod - 1) + 1
      val b = (j * 40503L + 2531011L) % mod
      var mn = Long.MaxValue
      var i = 0
      while (i < m) {
        val v = (a * sh.getLong(i) + b) % mod
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int, mod: Long, perms: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(text), n, mod, perms))
}

object MinHashSigCapped {
  def apply(text: Column, n: Int, mod: Long, perms: Int,
      exclude: Array[Long]): Column =
    GraftBridge.column(MinHashSigCapped(GraftBridge.expression(text), n, mod, perms, exclude))
}
