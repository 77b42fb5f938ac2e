package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing / tokenization toolkit.
  *
  * The correctness harness hash-compares Spark output against DuckDB, so every
  * "random" function used by dedup/similarity operators (shingle hashes,
  * MinHash permutations, SimHash bit mixing) must be computable *identically*
  * in both engines. Engine-native hashes differ (Spark xxhash64 vs DuckDB
  * hash), so we build on md5 — available and identical everywhere — and fold
  * its leading 12 hex digits into a 48-bit integer with pure int64 arithmetic
  * (every intermediate stays far below 2^63; no overflow under ANSI mode).
  *
  * All functions are built-in expression trees (codegen'd, no UDFs).
  */
object PortableHash {

  /** 2^31-1, Mersenne prime — modulus for MinHash permutation hashes.
    * Products (a·h) stay < 2^62. */
  val M31: Long = 2147483647L

  /** Large prime modulus for the rolling text fingerprint. */
  val MFp: Long = 1000000007L

  /** Portable half-up rounding to n decimals: floor(x·10ⁿ + 0.5)/10ⁿ — pure
    * double arithmetic, so both engines execute the *same* FP ops and agree
    * bit-for-bit on bit-identical inputs. Engine-native `round()` differs on
    * .xx5 boundaries (Spark rounds the shortest decimal rendering, DuckDB
    * the binary value) — observed once in 600k rows at sf0.1. Use this for
    * every per-row rounding; aggregate outputs may keep native `round()`
    * (their inputs already differ in final ulps across engines, and the
    * boundary probability there is ~1e-6).
    */
  def pround(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    floor(c * f + 0.5) / f
  }

  def proundSql(x: String, n: Int): String = {
    val f = s"1e$n"
    s"floor(($x) * $f + 0.5) / $f"
  }

  /** Hex digit char → numeric value; ASCII arithmetic only so the DuckDB
    * translation (`ascii(c)-48-CASE…`) is bit-identical. */
  private def hexVal(ch: Column): Column =
    (ascii(ch) - 48 - when(ascii(ch) >= 97, 39).otherwise(0)).cast("long")

  /** First 12 hex digits of md5(s) folded to a 48-bit non-negative long —
    * evaluated by the native codegen'd [[H48]] expression (hot path); the
    * built-in composition below is kept as the reference implementation and
    * cross-checked against it in PortableHashSpec.
    */
  def h48(s: Column): Column = H48(s)

  /** Built-in-only rendition of [[h48]] (reference semantics). */
  def h48Builtin(s: Column): Column =
    aggregate(split(substring(md5(s), 1, 12), ""), lit(0L),
      (acc, ch) => acc * 16 + hexVal(ch))

  /** DuckDB rendition of [[h48]] (for oracle SQL assembly). */
  def h48Sql(x: String): String =
    s"(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
    s"list_transform(string_split(substr(md5($x), 1, 12), ''), " +
    s"c -> CAST(ascii(c) - 48 - CASE WHEN ascii(c) >= 97 THEN 39 ELSE 0 END AS BIGINT))), " +
    s"(a, b) -> a * 16 + b))"

  /** Whitespace tokenization (trim first so both engines see no edge empties). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokensSql(x: String): String = s"regexp_split_to_array(trim($x), '\\s+')"

  /** Word n-gram shingles as strings; empty array when fewer than n tokens.
    * (Spark `sequence(1, k)` counts *down* when k<1 — hence the guard.) */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(w: String, n: Int = 3): String =
    s"CASE WHEN len($w) >= $n THEN " +
    s"[array_to_string($w[i:i+${n - 1}], ' ') for i in generate_series(1, len($w) - ${n - 1})] " +
    s"ELSE [] END"

  /** MinHash permutation j applied to a pre-hashed shingle value h∈[0,M31):
    * (a_j·h + b_j) mod M31 with Knuth-style multiplier-derived coefficients.
    */
  def permuted(j: Column, h: Column): Column = {
    val a = (j * lit(2654435761L)) % lit(M31 - 1) + 1
    val b = (j * lit(40503L) + lit(2531011L)) % lit(M31)
    (a * h + b) % lit(M31)
  }

  def permutedSql(j: String, h: String): String =
    s"((((($j) * 2654435761) % ${M31 - 1}) + 1) * ($h) + ((($j) * 40503 + 2531011) % $M31)) % $M31"

  /** Rolling polynomial fingerprint of a (pre-normalized, ASCII-only) string:
    * fold acc·31 + codepoint mod MFp. The classic Rabin–Karp shape — the
    * document-level analog of the reference's content keying. Evaluated by
    * the native codegen'd [[PolyFp]] expression; the built-in composition
    * below is the reference implementation, cross-checked in
    * PortableHashSpec.
    */
  def polyFingerprint(s: Column): Column = PolyFp(s)

  /** Built-in-only rendition of [[polyFingerprint]] (reference semantics). */
  def polyFingerprintBuiltin(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % lit(MFp))

  def polyFingerprintSql(x: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
    s"list_transform(string_split($x, ''), c -> CAST(ascii(c) AS BIGINT))), " +
    s"(a, b) -> (a * 31 + b) % $MFp)"
}
