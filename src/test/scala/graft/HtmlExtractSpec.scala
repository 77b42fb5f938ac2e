package graft

import org.apache.spark.sql.functions.col
import graft.functions.HtmlBlocks
import graft.functions.HtmlBlocks.Block
import graft.operators.TextOps

/** q155's block extractor: parser laws on hand-built markup (independent of
  * the fixture page), keep-rule boundaries, and the corpus-level identity
  * against a driver recomputation. */
class HtmlExtractSpec extends SparkSpec {

  test("block segmentation: boundaries, entities, whitespace collapse") {
    val blocks = HtmlBlocks.parse(
      "<html><body><h1>A   Big\n\tTitle</h1><p>first &amp; second &lt;p&gt;" +
        "</p><div>tail</div></body></html>")
    assert(blocks == Vector(
      Block("A Big Title", 0),
      Block("first & second <p>", 0),
      Block("tail", 0)))
  }

  test("script/style/head content is invisible; inline tags do not split") {
    val blocks = HtmlBlocks.parse(
      "<head><title>ignored</title><style>p { color: red }</style></head>" +
        "<body><script>var x = '<p>not text</p>';</script>" +
        "<p>one <b>bold</b> and <em>em</em> phrase</p></body>")
    assert(blocks == Vector(Block("one bold and em phrase", 0)))
  }

  test("anchor accounting: nested spans, unclosed tags, stray '<' survive") {
    val blocks = HtmlBlocks.parse(
      "<p>go <a href='/x'>to <b>this</b> page</a> now</p>" +
        "<p>3 < 4 is true</p><p>open <a>link text")
    assert(blocks == Vector(
      Block("go to this page now", "tothispage".length),
      Block("3 < 4 is true", 0),
      Block("open link text", "linktext".length)))
  }

  test("keep rule boundaries: length floor and 0.4 link density are exact") {
    val exact = "x" * HtmlBlocks.MinBlockChars
    assert(Block(exact, 0).kept)
    assert(!Block(exact.drop(1), 0).kept)
    // 5·A < 2·T: T = 25 → kept iff A < 10
    assert(Block(exact, 9).kept)
    assert(!Block(exact, 10).kept)
  }

  test("q155 recovers exactly the article text of every fixture page") {
    val rows = TextOps.htmlMainContent(spark, sf001).collect()
    val docs = Tables.documents(spark, sf001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    var variety = Set.empty[Long]
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val w = text.trim.split("\\s+").toSeq
      val k = (w.length + 1) / 2
      val cand = Seq(w.take(k).mkString(" "), w.drop(k).mkString(" "),
        w.take(3).mkString(" "))
      val kept = cand.filter(_.length >= HtmlBlocks.MinBlockChars)
      assert(r.getAs[Long]("n_kept") == kept.length.toLong)
      assert(r.getAs[Long]("main_chars") == kept.mkString("\n").length.toLong)
      assert(r.getAs[Long]("main_h48") ==
        graft.functions.H48.hash(kept.mkString("\n").getBytes("UTF-8")))
      // chrome must never leak into the kept count: 5 chrome blocks always
      // present, never kept
      assert(r.getAs[Long]("n_blocks") ==
        5L + cand.count(_.nonEmpty))
      variety += r.getAs[Long]("n_kept")
    }
    assert(variety.size >= 2,
      s"fixture should exercise BOTH keep and drop decisions: $variety")
  }

  test("markup-bearing corpus tokens survive the page synthesis verbatim") {
    import spark.implicits._
    // Every token here would be parsed as markup or decoded as an entity if
    // embedded raw: '<b' opens an inline tag, '</p>' would close the article
    // paragraph early, '&amp;'/'&nbsp;' would decode to '&'/' '. The
    // synthesis escapes '&' and '<', the extractor decodes on the way out,
    // so the recovered main content must be byte-identical to the raw text.
    val hostile = "price <b>is</b> 3<4 &amp; still &nbsp; rising </p> " +
      "closing <script>alert(1)</script> token salad filler words here"
    val df = Seq((1L, hostile)).toDF("doc_id", "text")
    val page = df.select(
      TextOps.htmlFixturePage(col("doc_id"), col("text")).as("p"))
      .head().getString(0)
    val main = HtmlBlocks.parse(page).filter(_.kept).map(_.text)
    val w = hostile.trim.split("\\s+").toSeq
    val k = (w.length + 1) / 2
    val expected = Seq(w.take(k).mkString(" "), w.drop(k).mkString(" "),
      w.take(3).mkString(" ")).filter(_.length >= HtmlBlocks.MinBlockChars)
    assert(main == expected.toVector,
      s"main=$main\nexpected=$expected")
    // and the block census is the closed-form chrome + article arithmetic —
    // no phantom blocks opened by corpus markup
    assert(HtmlBlocks.parse(page).length ==
      5 + Seq(w.take(k), w.drop(k), w.take(3)).count(_.nonEmpty))
  }

  test("main_content is callable from SQL after install and matches the Column API") {
    graft.plans.GraftExtensions.install(spark)
    Tables.documents(spark, sf001).createOrReplaceTempView("docs_html")
    val page = "'<nav><li><a href=x>Home</a></li></nav><p>' || text || '</p>'"
    val viaSql = spark.sql(
      s"SELECT doc_id, main_content($page) AS m FROM docs_html ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val viaCol = Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.functions.HtmlMainContent(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("<nav><li><a href=x>Home</a></li></nav><p>"),
          col("text"), org.apache.spark.sql.functions.lit("</p>"))).as("m"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaSql.sameElements(viaCol))
  }
}
