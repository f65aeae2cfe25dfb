package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass document-statistics expressions behind the quality
  * gates (`gopher_stats`, `quality_stats`).
  *
  * Why these exist: the column formulations in
  * [[graft.text.TextAnalysis.gopherCounts]] / `qualityMetrics` build each
  * count as its OWN lambda-bearing expression over `split(text, ...)`.
  * Catalyst cannot share those: runtime common-subexpression elimination
  * skips any tree containing a `LambdaVariable` (SPARK-35410), and
  * predicate pushdown inlines project aliases into filters with no cost
  * check — so a WHERE built from 8 such counts re-runs the regex split 8
  * times per row however the caller binds it. On the curation pipeline
  * the Gopher gate was 88% of the 5M-doc wall for exactly this reason.
  *
  * Each expression here makes ONE pass over the text (plus one over its
  * lowercase form for the stopword/distinct-token counts) in plain JVM
  * code with hand-rolled ASCII character classes — no regex, no token
  * array materialization — and participates in whole-stage codegen. The
  * Gopher pass/fail decision is a FIELD of the struct, so a quality gate
  * is a single-reference filter: one evaluation per row, even after
  * Catalyst pushes the predicate through every projection above the scan.
  *
  * Semantics are bit-for-bit the column formulations' (the differential
  * contract TextStatsExprSpec enforces generatively):
  *  - Gopher words = maximal runs of non-`\s` (Java ASCII whitespace);
  *  - lines = `split(text, "\n", -1)` elements (so #'\n' + 1, trailing
  *    empties counted, empty text = 1 line);
  *  - bullet lines strip LEADING 0x20 SPACES ONLY (Spark `ltrim`) before
  *    testing the "•" / "- " / "* " prefixes;
  *  - tokens = maximal runs outside `[\s\p{Punct}]` (POSIX ASCII punct);
  *  - the stopword and distinct-token counts tokenize
  *    `UTF8String.toLowerCase` — the identical lowercase Spark's `lower`
  *    applies under the default collation;
  *  - all lengths are codepoint counts (Spark `length`).
  */
object TextStats {

  /** Java regex `\s` default (ASCII-only) class. */
  @inline private def isWs(cp: Int): Boolean =
    cp == 0x20 || cp == 0x09 || cp == 0x0A || cp == 0x0B || cp == 0x0C || cp == 0x0D

  /** Java regex `\p{Punct}` (POSIX ASCII punctuation). */
  @inline private def isPunct(cp: Int): Boolean =
    (cp >= 0x21 && cp <= 0x2F) || (cp >= 0x3A && cp <= 0x40) ||
      (cp >= 0x5B && cp <= 0x60) || (cp >= 0x7B && cp <= 0x7E)

  /** Count of lowercase tokens present in `stops`, one scan; when `seen`
    * is non-null also collects the distinct lowercase tokens into it. */
  private def stopAndDistinct(lowered: String, stops: java.util.HashSet[String],
      seen: java.util.HashSet[String]): Long = {
    var hits = 0L
    var i = 0
    var tokStart = -1
    val n = lowered.length
    while (i < n) {
      val cp = lowered.codePointAt(i)
      if (isWs(cp) || isPunct(cp)) {
        if (tokStart >= 0) {
          val tok = lowered.substring(tokStart, i)
          if (stops.contains(tok)) hits += 1
          if (seen != null) seen.add(tok)
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += Character.charCount(cp)
    }
    if (tokStart >= 0) {
      val tok = lowered.substring(tokStart, n)
      if (stops.contains(tok)) hits += 1
      if (seen != null) seen.add(tok)
    }
    hits
  }

  /** All Gopher rule-set counts + the pass decision, one pass each over
    * the text and its lowercase form. Field semantics (and the integer
    * pass arithmetic) mirror [[graft.text.TextAnalysis.gopherCounts]] /
    * `gopherPasses` exactly. */
  def gopherStats(text: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    val s = text.toString
    val n = s.length
    // --- word pass (runs of non-whitespace) ---
    var nWords = 0L; var sumLen = 0L; var nAlpha = 0L; var nSym = 0L
    var inWord = false; var wLen = 0L
    var hasAlpha = false; var hasSym = false; var dotRun = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isWs(cp)) {
        if (inWord) {
          nWords += 1; sumLen += wLen
          if (hasAlpha) nAlpha += 1
          if (hasSym) nSym += 1
          inWord = false; wLen = 0; hasAlpha = false; hasSym = false; dotRun = 0
        }
      } else {
        inWord = true; wLen += 1
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) hasAlpha = true
        if (cp == '#') hasSym = true
        if (cp == '.') { dotRun += 1; if (dotRun >= 3) hasSym = true }
        else dotRun = 0
      }
      i += Character.charCount(cp)
    }
    if (inWord) {
      nWords += 1; sumLen += wLen
      if (hasAlpha) nAlpha += 1
      if (hasSym) nSym += 1
    }
    // --- line pass (split on '\n', trailing empties kept) ---
    var nLines = 0L; var nBullet = 0L; var nEllipsis = 0L
    var lineStart = 0
    var j = 0
    while (j <= n) {
      if (j == n || s.charAt(j) == '\n') {
        nLines += 1
        // ltrim strips 0x20 spaces ONLY (Spark StringTrimLeft default)
        var p = lineStart
        while (p < j && s.charAt(p) == ' ') p += 1
        if (p < j) {
          val c = s.charAt(p)
          if (c == '•' ||
            ((c == '-' || c == '*') && p + 1 < j && s.charAt(p + 1) == ' ')) nBullet += 1
        }
        if (j - lineStart >= 3 && s.charAt(j - 1) == '.' &&
          s.charAt(j - 2) == '.' && s.charAt(j - 3) == '.') nEllipsis += 1
        lineStart = j + 1
      }
      j += 1
    }
    // --- stopword pass over the lowercase text ---
    val nStops = stopAndDistinct(text.toLowerCase.toString, stops, null)
    val passes =
      if (nWords >= 50L && nWords <= 100000L &&
        sumLen >= nWords * 3 && sumLen <= nWords * 10 &&
        nSym * 10 <= nWords &&
        nBullet * 10 <= nLines * 9 &&
        nEllipsis * 10 <= nLines * 3 &&
        nAlpha * 5 >= nWords * 4 &&
        nStops >= 2L) 1 else 0
    InternalRow(nWords, sumLen, nAlpha, nSym, nLines, nBullet, nEllipsis, nStops, passes)
  }

  /** The `qualityMetrics` count family + the BPE-ish word-piece count, one
    * pass each over the text and its lowercase form. All fields are exact
    * ints matching the column formulations (codepoint lengths). */
  def qualityStats(text: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    val s = text.toString
    val n = s.length
    var nChars = 0; var nPunct = 0; var nDigits = 0
    var nTokens = 0; var maxTokLen = 0; var wordPieces = 0L
    var inTok = false; var tLen = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      nChars += 1
      val punct = isPunct(cp)
      if (punct) nPunct += 1
      if (cp >= '0' && cp <= '9') nDigits += 1
      if (isWs(cp) || punct) {
        if (inTok) {
          nTokens += 1
          if (tLen > maxTokLen) maxTokLen = tLen
          wordPieces += (tLen + 3) / 4 // ceil(len/4)
          inTok = false; tLen = 0
        }
      } else { inTok = true; tLen += 1 }
      i += Character.charCount(cp)
    }
    if (inTok) {
      nTokens += 1
      if (tLen > maxTokLen) maxTokLen = tLen
      wordPieces += (tLen + 3) / 4
    }
    val seen = new java.util.HashSet[String]()
    val nStops = stopAndDistinct(text.toLowerCase.toString, stops, seen)
    InternalRow(nChars, nTokens, seen.size, nStops.toInt, nPunct, nDigits,
      maxTokLen, wordPieces)
  }

  private[functions] def toStopSet(stopwords: Seq[String]): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    stopwords.foreach(set.add)
    set
  }
}

/** `gopher_stats(text, stopwords)` → struct<n_words, sum_word_len,
  * n_alpha_words, n_symbol_words, n_lines, n_bullet_lines,
  * n_ellipsis_lines, n_stop_hits: bigint, passes: int>: the full Gopher
  * quality-filter signal set (Rae et al. 2021 Appendix A) + decision as
  * ONE single-pass evaluation — the filter-safe form of
  * [[graft.text.TextAnalysis.gopherCounts]]/`gopherPasses`. */
case class GopherStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  private val stopSet = TextStats.toStopSet(stopwords)
  override def prettyName: String = "gopher_stats"
  override def dataType: DataType = GopherStats.Out
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gopher_stats needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextStats.gopherStats(input.asInstanceOf[UTF8String], stopSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stops = ctx.addReferenceObj("gopherStops", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.gopherStats($c, $stops)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherStats {
  val Out: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_symbol_words", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet_lines", LongType, nullable = false),
    StructField("n_ellipsis_lines", LongType, nullable = false),
    StructField("n_stop_hits", LongType, nullable = false),
    StructField("passes", IntegerType, nullable = false)))
}

/** `quality_stats(text, stopwords)` → struct<n_chars_measured, n_tokens,
  * n_distinct_tokens, n_stopwords, n_punct, n_digits, max_token_len,
  * n_word_pieces: int>: the `qualityMetrics` count family (+ the BPE-ish
  * word-piece sum) as ONE single-pass evaluation. */
case class QualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  private val stopSet = TextStats.toStopSet(stopwords)
  override def prettyName: String = "quality_stats"
  override def dataType: DataType = QualityStats.Out
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quality_stats needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextStats.qualityStats(input.asInstanceOf[UTF8String], stopSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stops = ctx.addReferenceObj("qualityStops", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.qualityStats($c, $stops)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityStats {
  val Out: StructType = StructType(Seq(
    StructField("n_chars_measured", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digits", IntegerType, nullable = false),
    StructField("max_token_len", IntegerType, nullable = false),
    StructField("n_word_pieces", LongType, nullable = false)))
}
