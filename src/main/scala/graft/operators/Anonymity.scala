package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-audit primitives for data releases: k-anonymity and
  * l-diversity over a quasi-identifier combination — the check run
  * before publishing any person-derived table (the reference's domain
  * is personal-data integration, where every export faces exactly this
  * question). A release is k-anonymous when every quasi-identifier
  * combination matches ≥ k rows, and l-diverse when each combination
  * carries ≥ l distinct values of the sensitive attribute (k alone
  * fails when a uniform group leaks the sensitive value — Machanavajjhala
  * et al. 2007).
  *
  * One aggregation keyed by the quasi-identifier tuple; the report is
  * group-sized, never row-sized. Exact counts only. */
object Anonymity {

  /** Per quasi-identifier combination: group size, sensitive-value
    * diversity, and the k/l verdicts. */
  def audit(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, "k and l must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", (col("n") >= k).cast("int"))
      .withColumn("l_diverse", (col("n_sensitive") >= l).cast("int"))
  }
}
