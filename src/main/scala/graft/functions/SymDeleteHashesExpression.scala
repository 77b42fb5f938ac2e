package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the SymSpell-style deletion-neighborhood
  * blocking key set: the distinct h48 hashes of the input string plus every
  * 1- and 2-code-point-deletion variant. Two strings within Levenshtein
  * distance 2 share at least one variant hash, so an equality join on the
  * exploded hashes is a complete candidate generator for the edit-distance
  * ≤ 2 verifier (q107).
  *
  * Replaces the composed form — `array_distinct(concat(array(name),
  * transform(sequence(..), del1), flatten(transform(.., del2))))` with
  * per-variant `substr`/`concat` and a downstream `h48` — which built ~L²/2
  * variant STRINGS per row through interpreted CodegenFallback HOFs: the
  * same megamorphic-eval surface that made the shingle pipeline bimodal at
  * scale (q107 swung 62↔142 s run-to-run at sf1 on identical data). Here
  * each variant is hashed directly from the parent's UTF-8 bytes (md5 over
  * the bytes minus the deleted code point ranges — byte-identical to
  * hashing the variant string) with no string materialization at all.
  *
  * Hash-set semantics vs the composed form: the old `array_distinct`
  * deduped variant strings before hashing; deduping the hashes instead is
  * equivalent for every downstream use (the join key IS the hash), modulo
  * md5-48 collisions between distinct variants of the SAME name —
  * vanishing, and harmless: the candidate pair would still pass or fail
  * the exact Levenshtein verifier. Value identity against the composed
  * pipeline is property-tested in PortableHashSpec.
  */
case class SymDeleteHashes(child: Expression, window: Int = Int.MaxValue)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"symdelete_hashes requires STRING input, got ${child.dataType}")
    else if (window < 3) TypeCheckResult.TypeCheckFailure(
      s"symdelete_hashes window must be > k=2, got $window")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "symdelete_hashes"

  protected override def nullSafeEval(input: Any): Any =
    SymDeleteHashes.compute(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SymDeleteHashes.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): SymDeleteHashes =
    copy(child = newChild)
}

object SymDeleteHashes {

  /** Byte offset of each code point start, plus a sentinel end offset. */
  private def codePointStarts(bytes: Array[Byte]): Array[Int] = {
    var n = 0
    var i = 0
    while (i < bytes.length) { // count UTF-8 lead bytes
      if ((bytes(i) & 0xc0) != 0x80) n += 1
      i += 1
    }
    val starts = new Array[Int](n + 1)
    var k = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(n) = bytes.length
    starts
  }

  /** md5-h48 of code points `lo..` of `bytes` minus `di` and `dj` (-1 =
    * none) — the front (code points before `lo`) is NOT hashed, so names
    * differing only outside the window share window-variant keys. */
  private def variantHash(md: java.security.MessageDigest, bytes: Array[Byte],
                          starts: Array[Int], lo: Int, di: Int, dj: Int): Long = {
    md.reset()
    var k = lo
    val n = starts.length - 1
    while (k < n) {
      if (k != di && k != dj) md.update(bytes, starts(k), starts(k + 1) - starts(k))
      k += 1
    }
    val d = md.digest()
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Deletion-variant hashes over the last `window` code points only (the
    * whole string when it is shorter). Completeness for ed ≤ 2 with a
    * SUFFIX window mirrors SymSpell's prefix-window argument: edits at or
    * before the window boundary leave the two suffix windows equal up to a
    * boundary shift of at most the net indel count, and edits inside the
    * window are covered by the deletion cores — each side's window reaches
    * the common aligned core with (its in-window edits + its boundary
    * overhang) ≤ total edits ≤ 2 deletions, so the cores collide. Strings
    * differing only OUTSIDE the window share the identity window hash
    * (candidate kept, exact verifier decides). Property-tested against
    * random ≤2-edit pairs in PortableHashSpec.
    */
  def compute(s: UTF8String, window: Int): GenericArrayData = {
    val bytes = s.getBytes
    val starts = codePointStarts(bytes)
    val total = starts.length - 1
    val lo = if (total > window) total - window else 0
    val n = total - lo
    val md = H48.threadDigest()
    val out = new Array[Long](1 + n + n * (n - 1) / 2)
    var w = 0
    out(w) = variantHash(md, bytes, starts, lo, -1, -1); w += 1
    var i = lo
    while (i < total) {
      out(w) = variantHash(md, bytes, starts, lo, i, -1); w += 1
      var j = i + 1
      while (j < total) {
        out(w) = variantHash(md, bytes, starts, lo, i, j); w += 1
        j += 1
      }
      i += 1
    }
    // distinct (the composed form array_distinct'd variant strings)
    java.util.Arrays.sort(out)
    var uniq = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(uniq) = out(r); uniq += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  def apply(name: Column): Column =
    GraftBridge.column(SymDeleteHashes(GraftBridge.expression(name)))

  def apply(name: Column, window: Int): Column =
    GraftBridge.column(SymDeleteHashes(GraftBridge.expression(name), window))
}
