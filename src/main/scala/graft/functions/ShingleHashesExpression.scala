package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing the hashed word-n-gram shingle array
  * of a document in one pass: `h48(concat_ws(" ", window)) % mod` for every
  * n-token window of `split(trim(text), "\\s+")`.
  *
  * Byte-for-byte the same values as the composed pipeline it replaces
  * (`explode(shingles(tokens(text), n))` → `h48(sh) % M31`, PortableHash):
  * trim strips ASCII spaces only (UTF8String.trim semantics), tokenization
  * splits on runs of the six ASCII `\s` class bytes with Java
  * `Pattern.split(…, -1)` edge behavior (leading/trailing empty tokens
  * preserved), and each window's md5 input is the token bytes joined by
  * 0x20 — the exact `concat_ws(" ")` byte sequence. Multi-byte UTF-8 code
  * points never contain ASCII bytes, so the byte-level scan is exact.
  * Value identity vs the composed form is property-tested in
  * PortableHashSpec.
  *
  * Why native: the composed form walks an interpreted expression tree per
  * shingle (`transform` and `aggregate` are CodegenFallback; `ConcatWs`/
  * `StringSplit`/`ElementAt` evaluate via virtual `Expression.eval` calls)
  * and allocates four UTF8Strings per window. Beyond the steady-state cost,
  * the interpreted tree's throughput depends on JVM type-profile state at
  * shared `eval` call sites: measured at 10× scale, the SAME q36 pipeline
  * ran 17–50 s in a fresh session but 420–495 s when four unrelated queries
  * had polluted those megamorphic call sites first. One JIT-friendly native
  * loop removes both the steady-state overhead and that failure mode
  * (q36: 434 s → ~20 s inside the full scale-bench sequence).
  */
case class ShingleHashes(child: Expression, n: Int, mod: Long)
  extends UnaryExpression {
  require(n >= 1 && mod > 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $n, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private def isSpace(b: Byte): Boolean = // Java regex \s (ASCII-only default)
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** Hashed n-gram windows of the whitespace-tokenized input. */
  def compute(s: UTF8String, n: Int, mod: Long): GenericArrayData = {
    val bytes = s.trim().getBytes // UTF8String.trim: ASCII space only
    // token boundaries, Pattern.split("\\s+", -1) semantics: a leading
    // separator run yields a leading empty token, a trailing run a trailing
    // empty token, interior runs are single separators
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    def push(a: Int, b: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = a; ends(nTok) = b; nTok += 1
    }
    val len = bytes.length
    var i = 0
    if (len > 0 && isSpace(bytes(0))) push(0, 0) // leading empty token
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      val start = i
      while (i < len && !isSpace(bytes(i))) i += 1
      if (i > start) push(start, i)
    }
    if (len > 0 && isSpace(bytes(len - 1))) push(len, len) // trailing empty
    if (len == 0) push(0, 0) // "".split -> [""]

    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val md = H48.threadDigest()
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w < out.length) {
      md.reset()
      var k = 0
      while (k < n) {
        if (k > 0) md.update(0x20.toByte)
        md.update(bytes, starts(w + k), ends(w + k) - starts(w + k))
        k += 1
      }
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      out(w) = h % mod
      w += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int, mod: Long): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n, mod))
}
