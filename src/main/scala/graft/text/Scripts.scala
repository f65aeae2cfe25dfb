package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script-mix profile: per-document counts of characters in the
  * major writing systems plus digits/whitespace, and the dominant
  * script. The multilingual-curation companion to language ID
  * (`text/LangId.scala`): script ratios are cheap, model-free signals —
  * a "Latin" doc full of Cyrillic is mislabeled, mixed-script tokens are
  * a spam/homoglyph tell, and CJK text needs different tokenization
  * downstream.
  *
  * Implementation notes for exactness across engines: counts come from
  * `regexp_count` over Unicode script classes (Java `\p{IsXxx}` ==
  * RE2 `\p{Xxx}`, which the DuckDB oracle uses); whitespace is the
  * explicit class `[ \t\n\r\f]` because Java's `\s` and RE2's `\s`
  * disagree on vertical tab. Everything is a narrow map-only pass — no
  * shuffle, fully codegen'd, linear in bytes at any scale.
  */
object Scripts {

  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "\\p{IsLatin}",
    "cyrillic" -> "\\p{IsCyrillic}",
    "greek" -> "\\p{IsGreek}",
    "han" -> "\\p{IsHan}",
    "arabic" -> "\\p{IsArabic}")

  /** Adds n_<script> counts, n_digit / n_space / n_other, and `dominant`
    * (the script with the highest count; ties break alphabetically —
    * `none` when every script count is zero). */
  def profile(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val text = col(textCol)
    val counts: Seq[(String, Column)] = ScriptClasses.map { case (name, cls) =>
      name -> regexp_count(text, lit(cls)).cast("long")
    }
    val base = df.select(
      Seq(col(idCol)) ++
        counts.map { case (n, c) => c.as(s"n_$n") } ++ Seq(
        regexp_count(text, lit("[0-9]")).cast("long").as("n_digit"),
        regexp_count(text, lit("[ \\t\\n\\r\\f]")).cast("long").as("n_space"),
        length(text).cast("long").as("n_chars")): _*)
    // dominant: sort (−count, name) structs ascending, take the head —
    // max count, alphabetical on ties, all inside codegen
    val ranked = array_sort(array(ScriptClasses.map { case (name, _) =>
      struct((-col(s"n_$name")).as("neg"), lit(name).as("script"))
    }: _*))
    base
      .withColumn("n_other",
        col("n_chars") - ScriptClasses.map(s => col(s"n_${s._1}"))
          .reduce(_ + _) - col("n_digit") - col("n_space"))
      .withColumn("dominant",
        when(element_at(ranked, 1).getField("neg") === 0, lit("none"))
          .otherwise(element_at(ranked, 1).getField("script")))
  }
}
