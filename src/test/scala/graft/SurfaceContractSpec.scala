package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract between the declared query surface and the oracle map — pure
  * map algebra, no Spark session. A query declared without an oracle
  * silently downgrades the driver's check to rows-only; an oracle without
  * a query is dead SQL. Both are bugs worth failing fast on.
  */
class SurfaceContractSpec extends AnyFunSuite {

  test("every declared query has an oracle and every oracle has a query") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(qs.diff(os).isEmpty,
      s"queries missing an oracle (driver would weaken to rows-only): ${qs.diff(os).toSeq.sorted}")
    assert(os.diff(qs).isEmpty,
      s"orphaned oracle SQL for undeclared queries: ${os.diff(qs).toSeq.sorted}")
  }

  test("query names are unique, well-formed, and densely numbered") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    val nums = names.map { n =>
      assert(n.matches("q\\d+_[a-z0-9_]+"), s"malformed query name: $n")
      n.drop(1).takeWhile(_.isDigit).toInt
    }.sorted
    // dense numbering: a gap usually means a query was dropped accidentally
    assert(nums == (nums.min to nums.max).toSeq,
      s"non-contiguous query numbers: missing ${(nums.min to nums.max).toSet.diff(nums.toSet).toSeq.sorted}")
  }

  test("no oracle references engine-only constructs") {
    // DuckDB has no xxhash64 and Spark-style lambda syntax won't parse —
    // catching these at test time beats an ORACLE_SQL_ERROR row in scoring
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("xxhash64"), s"$name oracle uses Spark-only xxhash64")
      assert(!sql.toLowerCase.contains("timestamp_ntz"),
        s"$name oracle names a Spark-only type")
    }
  }
}
