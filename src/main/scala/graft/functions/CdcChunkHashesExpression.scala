package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for content-defined chunking (CDC): split a
  * document wherever a [[CdcChunkHashes.Window]]-byte rolling hash satisfies
  * the boundary condition (`r % `[[CdcChunkHashes.Divisor]]` == 0`), and
  * emit each chunk's [[PolyFp]] content hash. Boundaries depend only on
  * LOCAL content, so inserting or deleting a run of text shifts chunk
  * boundaries only near the edit — the downstream chunks re-align and still
  * hash-match, which is exactly what fixed-size chunking (q90) cannot do.
  *
  * The rolling hash at (1-based) position `i` is the direct windowed sum
  * `Σ_{j=0..W-1} byte(i−j) · (31^j mod M)  mod M` with M = 1e9+7 — every
  * term ≤ 255·(M−1) and the 16-term sum < 2^63, so one final `% M` suffices
  * and the DuckDB oracle can evaluate the identical expression with
  * embedded `31^j mod M` literals (no incremental-update state to
  * replicate). Boundary positions exclude the final character (a cut there
  * would only create an empty trailing chunk). Intended for the normalized
  * `[a-z0-9 ]` domain (one byte per character, `ascii(c)` = the byte), like
  * [[PolyFp]].
  *
  * Same escalation rule as [[ShingleHashes]]: per-position window math over
  * multi-hundred-byte documents is interpreted-HOF territory in composed
  * form; one JIT-friendly native loop keeps it inside codegen.
  */
case class CdcChunkHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_hashes requires STRING input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  protected override def nullSafeEval(input: Any): Any =
    CdcChunkHashes.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunkHashes.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}

object CdcChunkHashes {
  val Window = 16
  val Divisor = 64   // expected chunk length ≈ Divisor bytes

  /** 31^j mod M for j = 0..Window-1 (shared with the oracle SQL). */
  val PowMod: Array[Long] = {
    val a = new Array[Long](Window)
    a(0) = 1L
    var j = 1
    while (j < Window) { a(j) = a(j - 1) * 31 % PortableHash.MFp; j += 1 }
    a
  }

  def compute(bytes: Array[Byte]): GenericArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    // PRECONDITION (enforced, not assumed): the hash is defined over BYTES
    // while every oracle indexes CHARACTERS (`ascii(s[i])`) — the two only
    // agree when each character is one byte. A caller bypassing the
    // `regexp_replace` normalization seam with multi-byte UTF-8 would
    // otherwise diverge from its oracle SILENTLY; fail loudly instead.
    // (One branch-predictable sign check per byte — noise next to the
    // 16-multiply window sum below.)
    var pc = 0
    while (pc < n) {
      if (bytes(pc) < 0) throw new IllegalArgumentException(
        "cdc_chunk_hashes requires single-byte (ASCII) input; normalize the " +
        "text first (e.g. lower + regexp_replace to [a-z0-9 ]) — found a " +
        s"multi-byte UTF-8 sequence at byte offset $pc")
      pc += 1
    }
    val m = PortableHash.MFp
    // cut points as counts-of-bytes-before-the-cut (matches the oracle's
    // 1-based boundary positions)
    var cuts = new Array[Int](8)
    var nCuts = 0
    def push(c: Int): Unit = {
      if (nCuts == cuts.length) cuts = java.util.Arrays.copyOf(cuts, nCuts * 2)
      cuts(nCuts) = c; nCuts += 1
    }
    push(0)
    // 1-based position i ranges Window..n-1 (never n: an end cut would only
    // make an empty trailing chunk); 0-based last index i0 = i-1
    var i0 = Window - 1
    while (i0 <= n - 2) {
      var r = 0L
      var j = 0
      while (j < Window) { r += (bytes(i0 - j) & 0xffL) * PowMod(j); j += 1 }
      if (r % m % Divisor == 0) push(i0 + 1)
      i0 += 1
    }
    push(n)
    val out = new Array[Long](nCuts - 1)
    var k = 0
    while (k < nCuts - 1) {
      out(k) = PolyFp.hash(java.util.Arrays.copyOfRange(bytes, cuts(k), cuts(k + 1)))
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftBridge.column(CdcChunkHashes(GraftBridge.expression(c)))
}
