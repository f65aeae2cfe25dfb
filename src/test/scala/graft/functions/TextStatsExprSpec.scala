package graft.functions

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Differential contract of the native single-pass text-stats expressions:
  * `gopher_stats` / `quality_stats` must match the column-built
  * formulations (split + lambda counts) field-for-field on a generative
  * corpus that exercises every character-class edge the hand-rolled
  * scanner re-implements — ASCII-vs-unicode whitespace, POSIX punct, tab
  * vs space before bullets (ltrim strips 0x20 ONLY), surrogate-pair
  * codepoint lengths, trailing newlines (split keeps trailing empties),
  * ellipsis runs inside words, and unicode lowercasing. */
class TextStatsExprSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("the", "a", "of", "and")

  /** Deterministic generative corpus: 120 texts mixing the edge atoms. */
  private val corpus: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val words = Seq("the", "The", "a", "of", "and", "fox", "naïve", "héllo",
      "𝄞note", "#tag", "a...b", "...", "N°5", "x", "HTTP", "foo-bar", "née",
      "Straße", "İstanbul", "12345", "word.", "—dash", "•inline", "ALL_CAPS")
    val seps = Seq(" ", "  ", "\t", "\n", "\r\n", "", "\f", " \n ",
      "\n\n", " ") // NBSP is NOT Java \s — stays inside words
    val lineStarts = Seq("", "- ", "* ", "• ", "•", "  - ", "\t- ", " * x",
      "-x ", "*x ")
    val lineEnds = Seq("", "...", "..", "... ", ".", "…")
    def text(): String = {
      val nLines = rnd.nextInt(6)
      (0 to nLines).map { _ =>
        val n = rnd.nextInt(12)
        lineStarts(rnd.nextInt(lineStarts.length)) +
          (0 until n).map(_ => words(rnd.nextInt(words.length)))
            .mkString(seps(rnd.nextInt(seps.length))) +
          lineEnds(rnd.nextInt(lineEnds.length))
      }.mkString("\n")
    }
    Seq("", " ", "\n", "\n\n", "...", "the a of and", "•", "- ", "*  x",
      "a\n", "a\n\n", "  leading spaces", "\tleading tab",
      ("the quick brown fox jumps over a lazy dog of and " * 12).trim) ++
      (0 until 120).map(_ => text())
  }

  private val df = corpus.toDF("text").localCheckpoint()

  "gopher_stats" should "match the column-built gopherCounts/stopwordCount/gopherPasses" in {
    val g = TextAnalysis.gopherStats(col("text"), stops)
    val m = TextAnalysis.gopherCounts(col("text")).toMap
    val sw = TextAnalysis.stopwordCount(col("text"), stops).cast("long")
    val fields = Seq("n_words", "sum_word_len", "n_alpha_words",
      "n_symbol_words", "n_lines", "n_bullet_lines", "n_ellipsis_lines")
    val rows = df.select(
      (fields.flatMap(f => Seq(g.getField(f).as(s"native_$f"), m(f).as(s"col_$f"))) ++
        Seq(g.getField("n_stop_hits").as("native_stops"), sw.as("col_stops"),
          g.getField("passes").as("native_passes"),
          TextAnalysis.gopherPasses(m, sw).as("col_passes"),
          col("text"))): _*).collect()
    rows.foreach { r =>
      fields.foreach { f =>
        withClue(s"$f on ${r.getAs[String]("text").take(80)}: ") {
          r.getAs[Long](s"native_$f") shouldBe r.getAs[Long](s"col_$f")
        }
      }
      r.getAs[Long]("native_stops") shouldBe r.getAs[Long]("col_stops")
      r.getAs[Int]("native_passes") shouldBe r.getAs[Int]("col_passes")
    }
  }

  "quality_stats" should "match the column-built qualityMetrics/qualityScore/bpeish count" in {
    val native = TextAnalysis.qualityMetrics(col("text"), stops)
    val legacy = TextAnalysis.qualityMetricsCols(col("text"), stops).toMap
    val rows = df.select(
      (native.flatMap { case (f, c) =>
        Seq(c.as(s"native_$f"), legacy(f).as(s"col_$f")) } ++
        Seq(TextAnalysis.qualityScore(col("text"), stops).as("native_score"),
          TextAnalysis.qualityScoreCols(col("text"), stops).as("col_score"),
          TextAnalysis.bpeishTokenCount(col("text")).as("native_bpe"),
          TextAnalysis.bpeishTokenCountCols(col("text")).as("col_bpe"),
          col("text"))): _*).collect()
    val fields = Seq("n_chars_measured", "n_tokens", "n_distinct_tokens",
      "n_stopwords", "n_punct", "n_digits", "max_token_len")
    rows.foreach { r =>
      fields.foreach { f =>
        withClue(s"$f on ${r.getAs[String]("text").take(80)}: ") {
          r.getAs[Int](s"native_$f") shouldBe r.getAs[Int](s"col_$f")
        }
      }
      r.getAs[Double]("native_score") shouldBe r.getAs[Double]("col_score")
      r.getAs[Long]("native_bpe") shouldBe r.getAs[Long]("col_bpe")
    }
  }

  it should "propagate null text as a null struct" in {
    val rows = Seq[(java.lang.Long, String)]((1L, null), (2L, "the of a and x"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.qualityStats(col("text"), stops).as("q"),
        TextAnalysis.gopherStats(col("text"), stops).as("g"))
      .orderBy("id").collect()
    rows(0).isNullAt(1) shouldBe true
    rows(0).isNullAt(2) shouldBe true
    rows(1).isNullAt(1) shouldBe false
    rows(1).getStruct(2).getAs[Long]("n_words") shouldBe 5L
  }

  "a gopher_stats gate" should "survive predicate pushdown as one evaluation" in {
    // the filter-safety property itself: pushing `passes === 1` below a
    // projection must not change results (semantic check; the single-
    // evaluation claim is structural — one call_function reference)
    val base = df.withColumn("upper", upper(col("text")))
    val gated = base.where(
      TextAnalysis.gopherStats(col("text"), stops).getField("passes") === 1)
    val viaColumns = {
      val m = TextAnalysis.gopherCounts(col("text")).toMap
      val sw = TextAnalysis.stopwordCount(col("text"), stops).cast("long")
      base.where(TextAnalysis.gopherPasses(m, sw) === 1)
    }
    gated.select("text").collect().map(_.getString(0)).sorted shouldBe
      viaColumns.select("text").collect().map(_.getString(0)).sorted
  }
}
