package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.UrlCanon
import graft.operators.TextOps

/** q160's canonicalizer: recipe laws on hand-built URLs (independent of the
  * fixture synthesis), idempotence, and the SQL≡Column registration law. */
class UrlCanonSpec extends SparkSpec {

  private def c(s: String): String =
    UrlCanon.canon(UTF8String.fromString(s)).toString

  test("canonicalization recipe: case, default port, www, tracking, sort, fragment") {
    assert(c("HTTP://WWW.Example.COM:80/p/7?utm_source=x&b=2&a=1#frag") ==
      "http://example.com/p/7?a=1&b=2")
    // https default port; path/query case preserved
    assert(c("HTTPS://Host.Example:443/A/B?Zz=1&aa=2") ==
      "https://host.example/A/B?Zz=1&aa=2")
    // non-default port survives; gclid/ref dropped; empty query drops '?'
    assert(c("http://example.com:8080/x?gclid=abc&ref=home") ==
      "http://example.com:8080/x")
    // empty path normalizes to '/'
    assert(c("http://example.com?a=1") == "http://example.com/?a=1")
    // :80 on https (not the scheme default) survives
    assert(c("https://example.com:80/x") == "https://example.com:80/x")
    // no scheme separator: fragment-stripped passthrough, not a URL
    assert(c("not a url#frag") == "not a url")
    // param VALUES are never reordered or dropped, only whole params
    assert(c("http://e.com/p?b=utm_x&a=1") == "http://e.com/p?a=1&b=utm_x")
  }

  test("param sort is UTF-8 byte order (DuckDB binary collation), not UTF-16") {
    // U+10000 (surrogate pair, UTF-8 f0 90 80 80) vs U+FFFD (UTF-8 ef bf bd):
    // UTF-16 code units order the surrogate (0xD800) BELOW 0xFFFD, but the
    // UTF-8 bytes order it ABOVE — the oracle's list_sort is byte order.
    val supp = new String(Character.toChars(0x10000))
    val bmp = "�"
    assert(c(s"http://e.com/p?$supp=1&$bmp=2") == s"http://e.com/p?$bmp=2&$supp=1")
    // and Scala's default String ordering would have produced the reverse,
    // so this case pins the divergence the byte sort exists to close
    assert(List(supp, bmp).sorted == List(supp, bmp))
  }

  test("canonicalization is idempotent (canon ∘ canon = canon)") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/p/7?utm_source=x&b=2&a=1#frag",
      "https://cdn.example.com/p/9?a=1&b=2",
      "http://example.com:8080/x?gclid=abc",
      "http://e.com/p")
    urls.foreach { u => assert(c(c(u)) == c(u), u) }
  }

  test("q160 equals a driver twin over the real ids; aliases collapse, cdn stays apart") {
    val rows = TextOps.urlDedup(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val ids = Tables.documents(spark, sf001).select("doc_id").collect().map(_.getLong(0))
    def urlOf(id: Long): String = {
      val pid = id / 6
      (id % 6) match {
        case 0 => s"HTTP://WWW.Example.COM:80/p/$pid?utm_source=crawler&b=2&a=1#frag"
        case 1 => s"http://example.com/p/$pid?a=1&b=2"
        case 2 => s"http://Example.com:80/p/$pid?b=2&a=1&fbclid=x$pid"
        case 3 => s"http://www.example.com/p/$pid?a=1&utm_medium=email&b=2"
        case 4 => s"https://cdn.example.com/p/$pid?a=1&b=2"
        case _ => s"http://example.com/p/$pid?a=1&b=2&ref=home#sec"
      }
    }
    val twin = ids.map(id => c(urlOf(id)) -> id).groupBy(_._1).toSeq
      .map { case (u, g) => (u, g.length.toLong, g.map(_._2).min) }
      .sortBy(_._1)
    assert(rows.toSeq == twin)
    // the synthesis exercises BOTH outcomes: collapsed alias groups (n > 1)
    // and the distinct cdn origin (n == 1)
    assert(rows.exists(_._2 > 1) && rows.exists(r => r._2 == 1 && r._1.startsWith("https://cdn.")))
    assert(rows.map(_._2).sum == ids.length, "groups partition the corpus")
  }

  test("url_canon is callable from SQL after install and matches the Column API") {
    graft.plans.GraftExtensions.install(spark)
    Tables.documents(spark, sf001).createOrReplaceTempView("docs_url")
    val mk = "'HTTP://WWW.E.com:80/p/' || CAST(doc_id AS STRING) || '?utm_a=1&b=' || CAST(doc_id AS STRING) || '#z'"
    val viaSql = spark.sql(
      s"SELECT doc_id, url_canon($mk) AS u FROM docs_url ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val viaCol = Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.functions.UrlCanonicalize(
        org.apache.spark.sql.functions.expr(mk)).as("u"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaSql.sameElements(viaCol))
    assert(viaSql.head._2 == "http://e.com/p/0?b=0")
  }
}
