package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals (Rae et al., "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", 2021, §A1.1.2:
  * duplicate-line fraction, duplicate-line CHARACTER fraction, top
  * n-gram character fraction) — the repetition dimension of
  * training-data quality filtering, complementing
  * [[TextAnalysis.gopherCounts]]'s length/format signals.
  *
  * All outputs are exact integers, so the operator is hash-comparable
  * against a SQL oracle. Scale shape: explode lines / bigrams →
  * hash-aggregate on (doc, item) → re-aggregate per doc — two
  * map-side-combinable shuffles keyed by doc+content, no window over the
  * whole corpus, no driver state.
  */
object Repetition {

  /** Per-document repetition signals:
    *  - n_lines, n_dup_lines (lines occurring > 1x in the doc),
    *    n_chars_dup_lines (their total characters, counting every copy)
    *  - n_bigrams, top_bigram_n (occurrences of the doc's most frequent
    *    word bigram; ties by count — the count is what the filter uses)
    * Empty docs produce zero rows here; callers left-join and coalesce. */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))

    // ---- duplicate lines (whitespace-trimmed, empties dropped)
    val lines = d.select(col("doc_id"),
        explode(filter(transform(split(col("__text"), "\n"), l => trim(l)),
          l => length(l) > 0)).as("line"))
    val lineStats = lines
      .groupBy(col("doc_id"), col("line"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_lines"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_lines"),
        sum(when(col("c") > 1, col("c") * length(col("line"))).otherwise(0L))
          .as("n_chars_dup_lines"))

    // ---- top word bigram
    val toks = d.select(col("doc_id"),
      TextAnalysis.tokens(lower(col("__text"))).as("__toks"))
    val bigrams = toks.select(col("doc_id"),
        explode(filter(
          zip_with(col("__toks"), slice(col("__toks"), 2, 2147483646),
            (a, b) => concat_ws(" ", a, b)),
          s => s.rlike(" "))).as("bigram"))
    val bigramStats = bigrams
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_n"))

    lineStats.join(bigramStats, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dup_lines"), lit(0L)).as("n_dup_lines"),
        coalesce(col("n_chars_dup_lines"), lit(0L)).as("n_chars_dup_lines"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
  }
}
