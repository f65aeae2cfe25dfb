package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the per-package query registries aggregated by
  * [[graft.SparkEntry]]. */
private[graft] object EntryKit {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables(s, dir, name)

  /** Synthetic lat/lon derived deterministically from events (the test data
    * has no GPS traces): 4 distinct "places" per the value bucket. */
  def eventsAsObservations(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"), col("user_id").as("user"), col("ts"),
      (lit(40.0) + floor(col("value") / 50) * 0.05).as("lat"),
      (lit(-74.0) + floor(col("value") / 50) * 0.05).as("lon"),
      lit(25.0).as("accuracy"))

  /** Per-dataset oracle-fixture directory, derived from the data dir so
    * concurrent runs at different SFs can no longer cross-contaminate a
    * shared hardcoded path (r13 ADVICE): a query run against sf0.001
    * writes its fixture under a different directory than the sf0.01 run
    * whose fixture the static oracle SQL reads. */
  def fixtureDir(dir: String): String =
    "/tmp/graft_fixtures/" +
      dir.replaceAll("[^A-Za-z0-9.-]+", "_").replaceAll("^_+", "")
}
