package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin
import graft.functions.GeoTimeFunctions

/** Event–stay matching: the reference's LocationEventEnricher
  * (`thymeflow/src/main/com/thymeflow/enricher/LocationEventEnricher.scala:66-95`):
  * join calendar events to extracted stays when (1) their time intervals
  * overlap, (2) overlap covers > overlapMinRatio of the event duration,
  * (3) the locations are within maxDistanceMeters (haversine).
  *
  * Composed from the binned interval-overlap join (no cartesian product)
  * plus the codegen'd haversine expression — both residual filters run
  * inside the joined stage.
  */
object EventStayMatch {

  /** events: (event_id, e_start, e_end, e_lat, e_lon)
    * stays:  (stay_id, s_start, s_end, s_lat, s_lon)
    * Defaults mirror the reference: ratio > 0.2, distance <= 1000 m. */
  def matchEvents(
      events: DataFrame,
      stays: DataFrame,
      overlapMinRatio: Double = 0.2,
      maxDistanceMeters: Double = 1000.0,
      bucketSeconds: Long = 6L * 3600): DataFrame = {
    IntervalJoin.intervalOverlap(
        events, "e_start", "e_end", stays, "s_start", "s_end", bucketSeconds)
      .where(IntervalJoin.overlapRatio(
        col("e_start"), col("e_end"), col("s_start"), col("s_end")) > overlapMinRatio)
      .where(GeoTimeFunctions.haversineMeters(
        col("e_lat"), col("e_lon"), col("s_lat"), col("s_lon")) <= maxDistanceMeters)
  }
}
