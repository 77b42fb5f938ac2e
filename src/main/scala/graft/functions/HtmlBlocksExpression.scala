package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction over an HTML column — the bs4/lxml corpus-prep
  * tier (the reference ships both parsers,
  * real_estate_backend/requirements.txt:10-11) between q99's single-XPath
  * field extraction and q151's line-level boilerplate pass: strip a page's
  * navigation/sidebar/footer chrome and keep the article text.
  *
  * The algorithm is the public text-density/link-density family
  * (Arc90 Readability, Boilerpipe, jusText), reduced to a DETERMINISTIC
  * two-rule form both engines can agree on exactly:
  *
  *   1. BLOCK SEGMENTATION — one linear scan over the markup splits the
  *      page at block-level tags (`p div li ul ol h1..h6 td tr table nav
  *      footer header aside section article main body html br`); `script`,
  *      `style` and `head` content is invisible; `<a>` spans are tracked so
  *      every block knows its anchor-text share; entities `&amp; &lt; &gt;
  *      &quot; &#39; &nbsp;` decode; whitespace runs collapse to one space
  *      and blocks trim (empty blocks vanish).
  *   2. KEEP RULE — a block survives iff its visible text has at least
  *      [[HtmlBlocks.MinBlockChars]] characters AND its link density is
  *      below 0.4 (`5·anchorChars < 2·totalChars`): navigation and footer
  *      chrome is short or link-saturated, article prose is neither.
  *
  * Main content = surviving blocks joined with `\n`, in document order.
  *
  * Scale shape: a narrow per-row codegen'd projection — q59/q148's plan —
  * no shuffle before the presentation sort; at 100 TB this runs inside the
  * ingest scan's codegen span and feeds the text tiers a chrome-free
  * corpus.
  */
case class HtmlMainContent(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"main_content requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "main_content"

  protected override def nullSafeEval(input: Any): Any =
    HtmlBlocks.mainContent(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlBlocks.mainContent($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlMainContent =
    copy(child = newChild)
}

/** Block accounting over the same parse: total or surviving block count
  * (`keptOnly`) — the audit columns q155 emits beside the extracted text. */
case class HtmlBlockCount(child: Expression, keptOnly: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_block_count requires STRING input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "html_block_count"

  protected override def nullSafeEval(input: Any): Any =
    HtmlBlocks.blockCount(input.asInstanceOf[UTF8String], keptOnly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlBlocks.blockCount($c, $keptOnly)")

  override protected def withNewChildInternal(newChild: Expression): HtmlBlockCount =
    copy(child = newChild)
}

object HtmlBlocks {
  /** Minimum visible characters for a block to count as content. */
  val MinBlockChars = 25

  /** One segmented block: collapsed visible text + its anchor-text share. */
  final case class Block(text: String, anchorChars: Int) {
    def totalChars: Int = text.length
    /** The keep rule: long enough AND link density < 0.4. */
    def kept: Boolean =
      totalChars >= MinBlockChars && 5L * anchorChars < 2L * totalChars
  }

  private val BlockTags: Set[String] = Set(
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "tr", "table", "nav", "footer", "header", "aside", "section",
    "article", "main", "body", "html", "br")

  private val InvisibleTags: Set[String] = Set("script", "style", "head", "title")

  /** Linear-scan block segmentation (rule 1 above). Tolerant of arbitrary
    * attributes, unclosed tags and stray `<`; never throws. */
  def parse(html: String): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    val sb = new java.lang.StringBuilder()
    var anchorChars = 0
    var anchorDepth = 0
    var invisible = 0          // nested script/style/head depth
    var pendingSpace = false
    def emitChar(c: Char): Unit = {
      if (invisible == 0) {
        if (Character.isWhitespace(c)) pendingSpace = true
        else {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          sb.append(c)
          if (anchorDepth > 0) anchorChars += 1
        }
      }
    }
    def flushBlock(): Unit = {
      if (sb.length > 0) {
        out += Block(sb.toString, anchorChars)
        sb.setLength(0)
      }
      anchorChars = 0
      pendingSpace = false
    }
    var i = 0
    val n = html.length
    // '<' opens a tag only before a letter, '/' or '!' (doctype/comment) —
    // the HTML5 tokenizer rule; a bare "3 < 4" stays literal text
    def tagStart(at: Int): Boolean = at + 1 < n && {
      val c1 = html.charAt(at + 1)
      c1 == '/' || c1 == '!' || Character.isLetter(c1)
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && tagStart(i)) {
        val close = html.indexOf('>', i + 1)
        if (close < 0) { emitChar('<'); i += 1 }   // stray '<': literal text
        else {
          val inner = html.substring(i + 1, close).trim
          val isEnd = inner.startsWith("/")
          val name = inner.dropWhile(_ == '/').takeWhile(ch =>
            Character.isLetterOrDigit(ch)).toLowerCase
          if (name == "a") {
            if (isEnd) anchorDepth = math.max(0, anchorDepth - 1)
            else anchorDepth += 1
          } else if (InvisibleTags.contains(name)) {
            if (isEnd) invisible = math.max(0, invisible - 1) else invisible += 1
          }
          if (BlockTags.contains(name)) flushBlock()
          i = close + 1
        }
      } else if (c == '&') {
        // decode the enumerated entity set; unknown entities pass through
        val entities = Seq("&amp;" -> '&', "&lt;" -> '<', "&gt;" -> '>',
          "&quot;" -> '"', "&#39;" -> '\'', "&nbsp;" -> ' ')
        entities.find { case (e, _) => html.startsWith(e, i) } match {
          case Some((e, ch)) => emitChar(ch); i += e.length
          case None          => emitChar('&'); i += 1
        }
      } else { emitChar(c); i += 1 }
    }
    flushBlock()
    out.result()
  }

  /** Surviving blocks joined with '\n' (rule 2 above). */
  def mainContent(html: UTF8String): UTF8String =
    UTF8String.fromString(
      parse(html.toString).filter(_.kept).map(_.text).mkString("\n"))

  def blockCount(html: UTF8String, keptOnly: Boolean): Long = {
    val blocks = parse(html.toString)
    (if (keptOnly) blocks.count(_.kept) else blocks.size).toLong
  }
}

object HtmlMainContent {
  def apply(c: Column): Column =
    GraftBridge.column(HtmlMainContent(GraftBridge.expression(c)))
}

object HtmlBlockCount {
  def apply(c: Column, keptOnly: Boolean): Column =
    GraftBridge.column(HtmlBlockCount(GraftBridge.expression(c), keptOnly))
}
