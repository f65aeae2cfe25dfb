package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model scoring for training-data curation —
  * the CCNet-style quality dimension (Wenzek et al., "CCNet: Extracting
  * High Quality Monolingual Datasets from Web Crawl Data", 2020 — there
  * a KenLM perplexity; here a character-trigram model trained ON the
  * corpus itself, so the operator is self-contained and distributed).
  *
  * Scale shape: one count pass (explode trigrams → hash aggregate — the
  * classic map-side-combined wordcount), then scoring joins each doc's
  * trigrams against the counts on the trigram key (same plan family as
  * IDF/q28). Nothing driver-side; the model IS a DataFrame.
  *
  * The oracle-facing signals are exact integers (trigram totals,
  * rare-trigram counts at an integer threshold); the floating
  * average-log-probability is exposed for ranking but kept out of
  * hash-compared outputs (cross-engine float summation order).
  */
object CorpusLm {

  /** Lowercased character trigrams of a text column (positions overlap,
    * whitespace runs collapsed so formatting doesn't dominate). */
  def charTrigrams(text: Column): Column = {
    val t = regexp_replace(lower(text), "\\s+", " ")
    filter(
      // floor at 1: sequence(1, 0) would generate a DESCENDING range
      transform(sequence(lit(1), greatest(length(t) - 2, lit(1))), i => t.substr(i, lit(3))),
      s => length(s) === 3)
  }

  /** (trigram, cnt) model table over the corpus. */
  def trigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(charTrigrams(col(textCol))).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("cnt"))

  /** Per-document LM statistics against a (tri, cnt) model:
    * n_tri (trigram occurrences), n_distinct_tri, n_rare (occurrences
    * whose corpus count <= rareMax — the out-of-distribution signal) —
    * all exact integers — plus avg_logprob = mean over occurrences of
    * ln(cnt/total) (float; ranking use). Unseen trigrams (scoring docs
    * outside the training corpus) count as rare with cnt = 0. */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      rareMax: Long): DataFrame = {
    val total = model.agg(coalesce(sum(col("cnt")), lit(0L)).cast("double"))
      .head().getDouble(0)
    require(total > 0, "scoreDocs needs a non-empty trigram model")
    val occ = docs.select(col(idCol).as("doc_id"),
        explode(charTrigrams(col(textCol))).as("tri"))
    occ.join(model, Seq("tri"), "left_outer")
      .select(col("doc_id"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tri"),
        sum(when(col("cnt") <= rareMax, 1L).otherwise(0L)).as("n_rare"),
        avg(when(col("cnt") > 0, log(col("cnt") / total))
          .otherwise(log(lit(1.0) / (total + 1.0)))).as("avg_logprob"))
      .join(
        occ.groupBy(col("doc_id"))
          .agg(countDistinct(col("tri")).as("n_distinct_tri")),
        "doc_id")
      .select(col("doc_id"), col("n_tri"), col("n_distinct_tri"),
        col("n_rare"), col("avg_logprob"))
  }
}
