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

  /** Per-JVM run identifier folded into every fixture path: two
    * concurrent verify runs at the SAME SF previously shared one /tmp
    * directory (r14 verdict residue #2) — one run's overwrite could race
    * the other's DuckDB read. Start-time + pid is unique across
    * concurrently-alive processes and stable within one. */
  private[graft] val runId: String = {
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    s"r${rt.getStartTime}p${rt.getPid}"
  }

  /** Per-run, per-dataset oracle-fixture directory, derived from the data
    * dir so concurrent runs at different SFs can no longer
    * cross-contaminate a shared hardcoded path (r13 ADVICE), and from
    * [[runId]] so concurrent runs at the SAME SF cannot either (r14).
    * The oracle SQL strings interpolate this at class init — same JVM as
    * the query run, so the emitted path and the written path agree —
    * and [[graft.Verify]] rewrites the interpolated sf0.01 default to
    * the actual verify SF when emitting oracle_sql.json. */
  def fixtureDir(dir: String): String = fixtureDir(dir, runId)

  private[graft] def fixtureDir(dir: String, run: String): String =
    s"/tmp/graft_fixtures/$run/" +
      dir.replaceAll("[^A-Za-z0-9.-]+", "_").replaceAll("^_+", "")
}
