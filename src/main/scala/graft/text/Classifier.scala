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

  /** Engine-independent token -> bucket in [0, buckets): a base-131
    * polynomial over the first FOUR hex chars of md5(token) — 65 536
    * distinct hex prefixes, so bucket counts up to 2^16 stay reachable
    * (two chars, the round-9 shape, silently capped every model at 256
    * live buckets). Use for oracle-checkable runs; md5 is a crypto hash
    * (~30 s per 100 M tokens) and the cap is enforced loudly —
    * production scoring and big vocabularies want [[tokenBucketFast]]
    * (xxhash64, uncapped). */
  def tokenBucket(tok: Column, buckets: Int): Column = {
    require(buckets <= 65536,
      s"tokenBucket's 4-hex-char md5 prefix reaches at most 65536 " +
        s"buckets, got $buckets — use tokenBucketFast for larger models")
    val h = md5(tok)
    pmod(((ascii(substring(h, 1, 1)) * lit(131) + ascii(substring(h, 2, 1)))
        * lit(131) + ascii(substring(h, 3, 1))) * lit(131)
        + ascii(substring(h, 4, 1)),
      lit(buckets))
  }

  /** Production bucket function: xxhash64 (native codegen, ~10× cheaper
    * than md5 + hex-string slicing). Same model format, different bucket
    * mapping — a model is trained against ONE bucket function and scored
    * with the same one, so the two are not interchangeable mid-model. */
  def tokenBucketFast(tok: Column, buckets: Int): Column =
    pmod(xxhash64(tok), lit(buckets.toLong)).cast("int")

  /** Document score: bias + Σ weights(bucket(token)). Exact when weights
    * are integer-valued (float addition of small ints is exact).
    * `fastHash` picks [[tokenBucketFast]] (production) over the
    * oracle-restatable md5 bucketing. */
  def hashedLinearScore(text: Column, weights: Seq[Double], bias: Double,
      fastHash: Boolean = false): Column = {
    require(weights.nonEmpty, "empty weight vector")
    val warr = array(weights.map(lit): _*)
    val bucket: Column => Column =
      if (fastHash) tokenBucketFast(_, weights.size)
      else tokenBucket(_, weights.size)
    aggregate(
      transform(TextAnalysis.tokens(text),
        t => element_at(warr, bucket(t) + 1)),
      lit(bias), (acc, x) => acc + x)
  }

  /** Score + threshold gate over a document table. Output:
    * (id, score, keep). When the graft extensions are installed and
    * `fastHash` is on, scoring runs on the single-pass native
    * [[graft.functions.LinearScore]] expression (no token array, no
    * lambda frames — ~4× over the column formulation at 500 k docs);
    * bit-identical to the column path, spec-enforced. */
  def gate(df: DataFrame, textCol: String, idCol: String,
      weights: Seq[Double], bias: Double, threshold: Double,
      fastHash: Boolean = false): DataFrame = {
    val native = fastHash && df.sparkSession.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("linear_score"))
    val score =
      if (native)
        call_function("linear_score", col(textCol),
          array(weights.map(lit): _*), lit(bias))
      else hashedLinearScore(col(textCol), weights, bias, fastHash)
    df.select(col(idCol), score.as("score"),
      (score > lit(threshold)).as("keep"))
  }
}
