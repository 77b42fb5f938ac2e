package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed [[Aggregator]] —
  * the custom-UDAF escalation tier SURVEY §2.8 reserves for sketches.
  *
  * Keeps the K smallest *distinct* 48-bit hash values per group; the
  * estimator is (K−1)·|domain| / kth_min once K values are held, or the
  * exact count below that. Two properties make it preferable to HLL here:
  *
  *  - **Deterministic**: "K smallest distinct values" is independent of
  *    partitioning and merge order, so the estimate is bit-stable across
  *    runs AND reproducible in any engine with the same hash — the DuckDB
  *    oracle computes the identical estimate (HLL implementations differ
  *    per engine and can only be rows-checked, cf. q19).
  *  - **Mergeable with bounded state**: the buffer is ≤ K longs; partial
  *    aggregation and tree merges work like any algebraic aggregate, so a
  *    100 TB distinct-count costs one pass + constant-size merges.
  *
  * Input is the pre-hashed column (PortableHash.h48 values in [0, 2^48)).
  */
object KmvSketch extends Aggregator[Long, Array[Long], Long] {

  val K = 64
  val Domain: Long = 1L << 48

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = b.foldLeft(a)(insert)

  /** Insert into the sorted k-smallest-distinct buffer (no-op when h is
    * already present or larger than a full buffer's kth value). */
  private[functions] def insert(b: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(b, h)
    if (idx >= 0) b                        // distinct-set semantics
    else {
      val ins = -idx - 1
      if (b.length >= K && ins >= K) b     // beyond the kth minimum
      else {
        val n = math.min(b.length + 1, K)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  def finish(b: Array[Long]): Long =
    if (b.length < K) b.length.toLong
    else (K - 1).toLong * Domain / b(K - 1)

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Buffer-returning sibling of [[KmvSketch]] for PRE-AGGREGATED sketch
  * tables (q130's daily cells): identical zero/reduce/merge, but `finish`
  * emits the ≤[[KmvSketch.K]]-long buffer itself instead of the estimate —
  * so a `groupBy(day).agg(...)` ships partial buffers map-side (≤ K longs
  * per group per map partition; the raw stream never reaches an exchange)
  * and the materialized cell IS the mergeable sketch any later window can
  * union. The distinct-set semantics live in the shared insert, so feeding
  * raw (non-distinct) hashes yields the same buffer as feeding the
  * distinct set.
  */
object KmvBuffer extends Aggregator[Long, Array[Long], Array[Long]] {
  def zero: Array[Long] = KmvSketch.zero
  def reduce(b: Array[Long], h: Long): Array[Long] = KmvSketch.insert(b, h)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvSketch.merge(a, b)
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
