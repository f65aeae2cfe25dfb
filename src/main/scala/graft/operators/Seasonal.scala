package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seasonal-baseline anomaly detection — the monitoring shape for
  * periodic event streams: learn a per-(group, season-slot) baseline
  * (hour-of-day here, any slot expression in general), score each
  * observation by its residual, and flag residuals past a robust
  * per-group threshold. Everything is exact integer arithmetic:
  * baselines are integer means (`sum div n`), the threshold is the mean
  * absolute deviation (`sum(abs) div n`) — a deliberate choice over
  * float z-scores so alarms are bit-identical on any engine (the same
  * rationale as the KS/TVD drift family, A16/A17).
  *
  * Scale shape: two aggregations over (group, slot) / (group) — tiny
  * result tables broadcast back onto the stream; the observation table
  * itself is never shuffled (both joins are broadcast). */
object Seasonal {

  /** @param df       observations
    * @param groupCol series key (e.g. event_type)
    * @param slotCol  season slot expression (e.g. hour(ts))
    * @param valueCol integral measure (e.g. cents)
    * @param mult     flag when |residual| > mult × meanAD
    * @return input keys + (slot, value, baseline, residual, is_anomaly) */
  def residuals(df: DataFrame, idCol: String, groupCol: String,
      slotCol: Column, valueCol: Column, mult: Int = 3): DataFrame = {
    val obs = df.select(col(idCol), col(groupCol),
        slotCol.cast("long").as("slot"), valueCol.cast("long").as("v"))
      // a null measure is "no observation" — keeping it would deflate
      // both the baseline and the meanAD (sum skips nulls, count(1)
      // doesn't)
      .where(col("v").isNotNull && col("slot").isNotNull)
    val profile = obs.groupBy(col(groupCol), col("slot"))
      .agg(expr("sum(v) div count(1)").as("baseline"))
    // read twice (spread + output join): materialize so the observation
    // scan and the profile join run once
    val scored = obs.join(broadcast(profile), Seq(groupCol, "slot"))
      .withColumn("residual", col("v") - col("baseline"))
      .localCheckpoint()
    val spread = scored.groupBy(col(groupCol))
      .agg(expr("sum(abs(residual)) div count(1)").as("mean_ad"))
    scored.join(broadcast(spread), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("slot"), col("v"),
        col("baseline"), col("residual"),
        (abs(col("residual")) > col("mean_ad") * mult).cast("int")
          .as("is_anomaly"))
  }
}
