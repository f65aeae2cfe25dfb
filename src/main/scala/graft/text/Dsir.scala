package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: hashed n-gram importance weights
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling"). Documents are scored by how much more likely their
  * token stream is under a TARGET distribution (the domain you want
  * more of) than under the RAW corpus distribution; top-weight
  * documents are what you keep/resample when composing a pre-training
  * mix.
  *
  * The classic estimator uses hashed unigram features: token → bucket
  * b = md5(token) mod B, per-bucket add-one-smoothed probabilities
  *
  *   p_tgt(b) = (tgt_b + 1) / (tgt_tot + B)
  *   p_raw(b) = (raw_b + 1) / (raw_tot + B)
  *
  * and the per-document log importance weight Σ_tokens log(p_tgt/p_raw).
  *
  * Determinism: each BUCKET's log-ratio is computed once and rounded to
  * a micro-unit integer (`round(x·10⁶)` → BIGINT); the per-document
  * score is then an exact INTEGER sum of those fixed-point terms, so
  * partial aggregation order (Spark) vs sequential order (an oracle
  * engine) cannot flip a single bit — the float enters exactly one
  * rounded scalar per bucket, never a float summation.
  *
  * Scale shape: one token-stream aggregation keyed by bucket (B rows out
  * — thousands, not corpus-sized), scalar totals as 1-row broadcasts,
  * the weight table broadcast back onto the token stream, and one exact
  * integer groupBy(doc). No shuffle ever carries text; the only
  * corpus-sized exchange is (doc_id, bucket) pairs into the final
  * aggregation, and map-side partial sums absorb hot buckets.
  */
object Dsir {

  /** Bucket id for a token column. The md5 form is stated identically in
    * SQL as ('0x'||substr(md5(t),1,8))::BIGINT % B — the oracle-parity
    * path; the xxhash64 form is the production fast path (codegen native,
    * no hex-string round-trip), same estimator, different (equally valid)
    * feature hashing. */
  private def bucket(tok: Column, buckets: Int, md5Oracle: Boolean): Column =
    if (md5Oracle) conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets
    else pmod(xxhash64(tok), lit(buckets.toLong))

  /** Per-document fixed-point importance scores.
    *
    * @param targetFilter rows where this predicate holds form the target
    *                     corpus (it must select a subset of `df`)
    * @return (idCol, n_tok, score_fp) — score_fp in integer micro-nats,
    *         0 for token-free documents
    */
  def importanceWeights(
      df: DataFrame,
      textCol: String,
      idCol: String,
      targetFilter: Column,
      buckets: Int = 1024,
      md5Oracle: Boolean = true): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // materialized once: the bucket-count branch and the final scoring
    // join both read (id, is_tgt, b) — without the checkpoint the
    // tokenize+hash pass (the dominant cost) would run per branch
    val toks = df.select(
        col(idCol),
        targetFilter.as("is_tgt"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("tok"))
      .select(col(idCol), col("is_tgt"),
        bucket(col("tok"), buckets, md5Oracle).as("b"))
      .localCheckpoint(false) // lazy: the per-bucket count materializes

    // one pass over the token stream: raw and target counts per bucket
    val perBucket = toks.groupBy(col("b")).agg(
      count(lit(1)).as("raw_n"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_n"))
    val totals = perBucket.agg(
      sum(col("raw_n")).as("raw_tot"), sum(col("tgt_n")).as("tgt_tot"))

    // fixed-point per-bucket log-ratio (micro-nats); B rows, broadcast
    val weights = perBucket.crossJoin(broadcast(totals)).select(
      col("b"),
      round(
        (log((col("tgt_n") + 1).cast("double") / (col("tgt_tot") + buckets)) -
         log((col("raw_n") + 1).cast("double") / (col("raw_tot") + buckets))) *
          lit(1000000L)).cast("long").as("w_fp"))

    val scored = toks
      .join(broadcast(weights), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("w_fp")).as("score_fp"))

    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
  }
}
