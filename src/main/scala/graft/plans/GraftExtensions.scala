package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, H48, MinHashSig, PolyFp, ShingleHashes}

/** `SparkSessionExtensions` installer exposing graft's native Catalyst
  * expressions to the SQL surface — the SURVEY §2/§7.3 extension seam: a
  * user of `spark.sql(...)` (or a JDBC/Thrift client) gets `h48(str)` and
  * `dot_product(arr, arr)` as first-class codegen'd functions, identical to
  * the Scala `Column` API.
  *
  * Two installation paths, same registrations:
  *  - cluster submission: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (applied at session build time, every session on the cluster);
  *  - embedded/interactive: `GraftExtensions.install(spark)` against a live
  *    session (used by the test suite; same builders, same registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** The injected function set — shared verbatim by both installation paths. */
  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("h48"),
      new ExpressionInfo("graft.functions.H48", "h48"),
      (children: Seq[Expression]) => H48(children.head)),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo("graft.functions.DotProduct", "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("poly_fp"),
      new ExpressionInfo("graft.functions.PolyFp", "poly_fp"),
      (children: Seq[Expression]) => PolyFp(children.head)),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo("graft.functions.ShingleHashes", "shingle_hashes"),
      (children: Seq[Expression]) =>
        ShingleHashes(children(0), intArg(children(1)), longArg(children(2)))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo("graft.functions.MinHashSig", "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children(0),
        intArg(children(1)), longArg(children(2)), intArg(children(3)))),
    (FunctionIdentifier("main_content"),
      new ExpressionInfo("graft.functions.HtmlMainContent", "main_content"),
      (children: Seq[Expression]) =>
        graft.functions.HtmlMainContent(children.head)),
    (FunctionIdentifier("url_canon"),
      new ExpressionInfo("graft.functions.UrlCanonicalize", "url_canon"),
      (children: Seq[Expression]) =>
        graft.functions.UrlCanonicalize(children.head)))

  /** SQL-side shape/permutation arguments must be literals (they size the
    * generated code); evaluated once at resolution.
    */
  private def intArg(e: Expression): Int = {
    val v = longArg(e)
    if (v < Int.MinValue || v > Int.MaxValue) throw new IllegalArgumentException(
      s"integer argument out of range: $v")
    v.toInt
  }
  private def longArg(e: Expression): Long = e.eval() match {
    case i: Int  => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }

  /** Register into a live session's function registry. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      GraftBridge.registerFunction(spark, name, info, builder)
    }
}
