package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the FIRST dedup tier of a crawl pipeline, run
  * before any content hashing: re-crawls reach the same page through
  * scheme/host case variants, default ports, `www.` aliases, tracking
  * parameters and fragments, and counting those as distinct documents
  * re-processes the whole downstream tier on them. (The reference's scrape
  * loop hits exactly this class of alias when it re-fetches parcel pages
  * through redirected search URLs — crs_ui_bot.py:211-228 normalizes by
  * re-navigating; a batch engine normalizes the string.)
  *
  * The canonical form is the PUBLIC recipe (RFC 3986 §6 syntax-based
  * normalization plus the standard tracking-param strip), reduced to a
  * deterministic sequence both engines reproduce exactly:
  *
  *   1. strip the fragment (everything from the first `#`);
  *   2. lowercase the scheme and the host (never the path or query);
  *   3. drop the scheme's default port (`:80` for http, `:443` for https)
  *      and a leading `www.` host alias;
  *   4. empty path → `/`;
  *   5. query: split on `&`, drop tracking parameters (name starting
  *      `utm_`, or `fbclid=` / `gclid=` / `ref=`), SORT the survivors
  *      byte-lexicographically, rejoin; drop the `?` when none survive.
  *
  * A string without `://` is returned fragment-stripped but otherwise
  * untouched (not a URL — garbage in, garbage out, loudly greppable).
  *
  * Scale shape: a pure per-row codegen'd projection (q59/q148/q155's
  * plan family) — runs inside the ingest scan's codegen span; the
  * canonical-group aggregate downstream is one uniform-key hash aggregate.
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_canon requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "url_canon"

  protected override def nullSafeEval(input: Any): Any =
    UrlCanon.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object UrlCanonicalize {
  def apply(c: Column): Column =
    GraftBridge.column(UrlCanonicalize(GraftBridge.expression(c)))
}

object UrlCanon {

  /** Tracking-parameter test shared by the expression and (as literals) the
    * oracle SQL: `utm_*` plus the enumerated click-id/referrer params. */
  private def isTracking(p: String): Boolean =
    p.startsWith("utm_") || p.startsWith("fbclid=") ||
      p.startsWith("gclid=") || p.startsWith("ref=")

  /** Unsigned byte-lexicographic `<` over the UTF-8 encodings — DuckDB's
    * binary collation, which the q160 oracle's `list_sort` applies. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Canonicalize one URL string (see the class scaladoc for the recipe).
    * Structural index scan, no regex — byte-equal to the oracle's
    * regexp_extract mirror on every `scheme://host[:port]path[?q][#f]`
    * input (UrlCanonSpec pins the agreement cases; q160's corpus oracle
    * hash-checks it end to end). */
  def canon(u: UTF8String): UTF8String = {
    val s0 = u.toString
    val hash = s0.indexOf('#')
    val s = if (hash >= 0) s0.substring(0, hash) else s0
    val sep = s.indexOf("://")
    if (sep < 0) return UTF8String.fromString(s)
    val sch = s.substring(0, sep).toLowerCase(Locale.ROOT)
    val rest = s.substring(sep + 3)
    // host ends at the first '/' or '?' ('#' is already stripped)
    var he = rest.length
    var i = 0
    while (i < rest.length && he == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') he = i
      i += 1
    }
    var host = rest.substring(0, he).toLowerCase(Locale.ROOT)
    val tail = rest.substring(he)
    if (sch == "http" && host.endsWith(":80")) host = host.substring(0, host.length - 3)
    else if (sch == "https" && host.endsWith(":443")) host = host.substring(0, host.length - 4)
    if (host.startsWith("www.")) host = host.substring(4)
    val qi = tail.indexOf('?')
    val path0 = if (qi >= 0) tail.substring(0, qi) else tail
    val path = if (path0.isEmpty) "/" else path0
    val query = if (qi >= 0) tail.substring(qi + 1) else ""
    // -1 keeps trailing empties so '' round-trips to '' (the oracle's
    // string_split has the same contract). Sort by UTF-8 BYTES, not
    // String's UTF-16 code units: the two orders diverge for
    // supplementary-plane params vs U+E000..U+FFFF (surrogates sort below
    // those code points in UTF-16 but above them as UTF-8 bytes), and the
    // oracle's list_sort is DuckDB's binary UTF-8 collation.
    val kept = query.split("&", -1).filterNot(isTracking).sortWith(utf8Lt)
    val sq = kept.mkString("&")
    UTF8String.fromString(
      sch + "://" + host + path + (if (sq.nonEmpty) "?" + sq else ""))
  }
}
