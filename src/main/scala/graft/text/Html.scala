package graft.text

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML visible-text extraction with link-density boilerplate removal —
  * the first step of every web-crawl curation pipeline (CCNet, Gopher,
  * FineWeb all start from extracted text, jusText/trafilatura-style).
  *
  * Single-pass tokenizer, pure JVM, no parser library:
  *   - `<!-- -->` comments, `<script>` and `<style>` elements are dropped
  *     with their content (case-insensitive close-tag scan);
  *   - block-level tags (`p div h1..h6 li ul ol br tr td th table nav
  *     header footer article section title blockquote pre hr form head
  *     body html`) delimit lines; inline tags vanish;
  *   - character entities decode (`&amp; &lt; &gt; &quot; &apos; &nbsp;`
  *     plus decimal/hex numeric refs); an unrecognized `&...` stays
  *     literal — lossy guessing would corrupt text;
  *   - per-line ASCII whitespace runs collapse to one space, empty lines
  *     drop;
  *   - each line carries its LINK DENSITY (fraction of its characters
  *     inside `<a>`): nav bars, footers, and related-links blocks are
  *     link-dominated, which is the classic jusText boilerplate signal.
  *
  * Everything is deterministic, so extraction queries oracle-check
  * hash-strict. The per-row cost is linear in the document; as a codegen
  * expression ([[HtmlTextExpr]]) it rides inside whole-stage codegen like
  * the other text kernels (no UDF boundary, no extra pass).
  */
object Html {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "nav", "header", "footer", "article",
    "section", "title", "head", "body", "html", "blockquote", "pre", "hr",
    "form")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B

  /** One extracted line: collapsed text, total chars, chars inside <a>. */
  final case class Line(text: String, chars: Int, linkChars: Int) {
    def linkDensity: Double = if (chars == 0) 0.0 else linkChars.toDouble / chars
  }

  /** Decode one entity starting at `&` (index i); returns (decoded,
    * nextIndex) or null-char marker keeping the literal. */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val body = s.substring(i + 1, semi)
    val decoded = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case b if b.startsWith("#x") || b.startsWith("#X") =>
        try String.valueOf(Character.toChars(Integer.parseInt(b.substring(2), 16)))
        catch { case _: RuntimeException => null }
      case b if b.startsWith("#") =>
        try String.valueOf(Character.toChars(Integer.parseInt(b.substring(1))))
        catch { case _: RuntimeException => null }
      case _ => null
    }
    if (decoded == null) ("&", i + 1) else (decoded, semi + 1)
  }

  /** Walk the markup and return the visible lines with link statistics. */
  def extractLines(html: String): Vector[Line] = {
    val out = Vector.newBuilder[Line]
    val cur = new StringBuilder
    var chars = 0
    var linkChars = 0
    var pendingSpace = false
    var linkDepth = 0
    var i = 0
    val n = html.length

    def flush(): Unit = {
      if (cur.nonEmpty) {
        out += Line(cur.toString, chars, linkChars)
        cur.clear(); chars = 0; linkChars = 0
      }
      pendingSpace = false
    }
    def append(text: String): Unit = {
      var j = 0
      while (j < text.length) {
        val c = text.charAt(j)
        if (isWs(c)) { if (cur.nonEmpty) pendingSpace = true }
        else {
          if (pendingSpace) {
            cur.append(' '); chars += 1
            if (linkDepth > 0) linkChars += 1
            pendingSpace = false
          }
          cur.append(c); chars += 1
          if (linkDepth > 0) linkChars += 1
        }
        j += 1
      }
    }
    /** index just past the case-insensitive close tag, or n. */
    def skipElement(name: String, from: Int): Int = {
      val close = "</" + name
      var k = from
      while (k < n) {
        if (html.charAt(k) == '<' && k + close.length <= n &&
            html.regionMatches(true, k, close, 0, close.length)) {
          val gt = html.indexOf('>', k)
          return if (gt < 0) n else gt + 1
        }
        k += 1
      }
      n
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(false, i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val gt = html.indexOf('>', i)
          if (gt < 0) { i = n } // dangling '<': drop the tail as markup
          else {
            val inner = html.substring(i + 1, gt)
            val closing = inner.startsWith("/")
            val rawName = (if (closing) inner.substring(1) else inner)
              .takeWhile(ch => !isWs(ch) && ch != '/' && ch != '>').toLowerCase
            i = gt + 1
            rawName match {
              case "script" | "style" if !closing => i = skipElement(rawName, i)
              case "a" => if (closing) linkDepth = math.max(0, linkDepth - 1)
                          else if (!inner.endsWith("/")) linkDepth += 1
              case t if BlockTags.contains(t) => flush()
              case _ => () // inline or unknown tag: no structural effect
            }
          }
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        append(decoded)
        i = next
      } else {
        append(String.valueOf(c))
        i += 1
      }
    }
    flush()
    out.result()
  }

  /** All visible text, newline-joined. */
  def extractText(html: String): String =
    extractLines(html).map(_.text).mkString("\n")

  /** Boilerplate-filtered text: lines whose link density exceeds the
    * threshold (nav/footer/link-farm blocks) are dropped. */
  def extractMainText(html: String, maxLinkDensity: Double = 0.5): String =
    extractLines(html).filter(_.linkDensity <= maxLinkDensity)
      .map(_.text).mkString("\n")
}

/** `html_text(html)` → string: boilerplate-filtered visible text at the
  * default 0.5 link-density threshold, as a codegen'd expression. */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "html_text"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"html_text needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Html.extractMainText(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.Html.extractMainText($c.toString(), 0.5))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
