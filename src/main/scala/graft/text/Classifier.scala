package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bag-of-words linear classifier INFERENCE — the fastText-style
  * quality/domain gate of large-scale curation pipelines (CCNet's LM
  * filter, DCLM's fastText classifier): each token hashes into one of B
  * weight buckets, the document score is the sum of its tokens' bucket
  * weights plus a bias, and the gate keeps documents whose score clears a
  * threshold. Training happens offline; what a 100 TB engine needs is
  * the scoring pass, and that is a pure per-row projection here.
  *
  * Design points:
  *  - the bucket function is md5-prefix ascii arithmetic — engine-
  *    independent (any SQL dialect restates it verbatim), unlike
  *    xxhash64/murmur whose seeds differ across engines — so oracle
  *    checks are exact;
  *  - the weight vector rides into codegen as an array literal (a real
  *    model would broadcast; at fastText's canonical B=2M buckets the
  *    array is 16 MB — well inside broadcast range);
  *  - the whole score is one `transform` + `aggregate` over the token
  *    array: narrow, shuffle-free, whole-stage-codegen'd, no UDF.
  *
  * Reference anchor: the reference has no trained classifier (personal
  * data, no corpus curation); this is part of the LLM-pipeline surface
  * beyond it.
  */
object Classifier {

  /** Engine-independent token -> bucket in [0, buckets): ascii arithmetic
    * on the first two hex chars of md5(token). */
  def tokenBucket(tok: Column, buckets: Int): Column = {
    val h = md5(tok)
    pmod(ascii(substring(h, 1, 1)) * lit(131) + ascii(substring(h, 2, 1)),
      lit(buckets))
  }

  /** Document score: bias + Σ weights(bucket(token)). Exact when weights
    * are integer-valued (float addition of small ints is exact). */
  def hashedLinearScore(text: Column, weights: Seq[Double], bias: Double): Column = {
    require(weights.nonEmpty, "empty weight vector")
    val warr = array(weights.map(lit): _*)
    aggregate(
      transform(TextAnalysis.tokens(text),
        t => element_at(warr, tokenBucket(t, weights.size) + 1)),
      lit(bias), (acc, x) => acc + x)
  }

  /** Score + threshold gate over a document table. Output:
    * (id, score, keep). */
  def gate(df: DataFrame, textCol: String, idCol: String,
      weights: Seq[Double], bias: Double, threshold: Double): DataFrame =
    df.select(col(idCol),
      hashedLinearScore(col(textCol), weights, bias).as("score"),
      (hashedLinearScore(col(textCol), weights, bias) > lit(threshold))
        .as("keep"))
}
