package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (JASA 1969) — the
  * decision-theoretic scoring layer the reference's entity-resolution
  * stack stops short of: thymeflow ranks candidate pairs with soft
  * TF-IDF similarity (`thymeflow/src/main/com/thymeflow/enricher/
  * entityresolution/EntityResolution.scala:54-116`) and a fixed
  * persistence threshold; Fellegi–Sunter instead learns, per comparison
  * field, how much an agreement or disagreement actually tells you:
  *
  *   m_f = P(field f agrees | pair is a match)
  *   u_f = P(field f agrees | pair is a non-match)
  *   agreement weight  w_f⁺ = ln(m_f / u_f)
  *   disagreement weight w_f⁻ = ln((1−m_f) / (1−u_f))
  *
  * and scores a pair by the sum of its per-field weights (the
  * log-likelihood ratio; fields assumed conditionally independent —
  * the classic naive-Bayes structure, same as Splink/dedupe.io).
  *
  * Estimation here is supervised (exact counts over a labeled pair
  * sample) — one tiny aggregation; the weights table is ≤ |fields| rows
  * of broadcast state. Scoring is a map-only pass over candidate pairs:
  * at 100 TB the pairs come from a blocking join (J3/J10/J11) and this
  * adds zero shuffles. Laplace-style clamping (counts offset by 1/2)
  * keeps weights finite on degenerate fields.
  *
  * Float discipline: m/u enter the ln as exact integer-count ratios and
  * every published score is rounded to 6 places, so a SQL oracle
  * restating the same count arithmetic reproduces the scores bit-for-bit
  * (the q88 pattern).
  */
object FellegiSunter {

  /** Per-field (m, u, agreement/disagreement weights) from a labeled
    * pair sample. `labeled` must carry `labelCol` (boolean/int 0-1) and
    * one 0/1 agreement column per field. Output: one row per field —
    * (field, m_num, m_den, u_num, u_den, w_agree, w_disagree), weights
    * rounded to 6. Counts are half-offset (+0.5 numerator, +1
    * denominator) so degenerate fields stay finite. */
  def weights(labeled: DataFrame, fields: Seq[String],
      labelCol: String): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    val lab = col(labelCol).cast("int")
    // coalesce each sum: a labeled sample with only ONE class present
    // makes the other class's sums NULL (not 0), which poisoned the
    // weights into null and NPE'd score() — the half-offset clamp only
    // keeps degenerate cases finite when the counts are actually zero
    val aggs = fields.flatMap { f =>
      Seq(
        coalesce(sum(when(lab === 1, col(f).cast("long"))), lit(0L))
          .as(s"${f}_m_num"),
        coalesce(sum(when(lab === 1, lit(1L))), lit(0L)).as(s"${f}_m_den"),
        coalesce(sum(when(lab === 0, col(f).cast("long"))), lit(0L))
          .as(s"${f}_u_num"),
        coalesce(sum(when(lab === 0, lit(1L))), lit(0L)).as(s"${f}_u_den"))
    }
    val row = labeled.agg(aggs.head, aggs.tail: _*)
    // unpivot to one row per field, then derive weights with the exact
    // half-offset ratios inside the ln
    val perField = fields.map { f =>
      row.select(
        lit(f).as("field"),
        col(s"${f}_m_num").as("m_num"), col(s"${f}_m_den").as("m_den"),
        col(s"${f}_u_num").as("u_num"), col(s"${f}_u_den").as("u_den"))
    }.reduce(_.unionByName(_))
    perField
      .withColumn("m", (col("m_num") + 0.5) / (col("m_den") + 1.0))
      .withColumn("u", (col("u_num") + 0.5) / (col("u_den") + 1.0))
      .withColumn("w_agree", round(log(col("m") / col("u")), 6))
      .withColumn("w_disagree",
        round(log((lit(1.0) - col("m")) / (lit(1.0) - col("u"))), 6))
      .drop("m", "u")
  }

  /** Total-weight score for candidate pairs: Σ_f (agree ? w_f⁺ : w_f⁻),
    * rounded to 6. `pairs` carries the same 0/1 agreement columns;
    * `weightsDf` is the [[weights]] output (broadcast-sized). Appends
    * `fs_score`. */
  def score(pairs: DataFrame, weightsDf: DataFrame,
      fields: Seq[String]): DataFrame = {
    val w = weightsDf.select("field", "w_agree", "w_disagree").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val terms = fields.map { f =>
      val (wa, wd) = w.getOrElse(f,
        throw new IllegalArgumentException(s"no weights for field $f"))
      when(col(f).cast("int") === 1, lit(wa)).otherwise(lit(wd))
    }
    pairs.withColumn("fs_score", round(terms.reduce(_ + _), 6))
  }
}
