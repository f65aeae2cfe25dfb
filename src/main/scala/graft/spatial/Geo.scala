package graft.spatial

import graft.functions.Haversine

/** Spatial statistics primitives backing stay extraction.
  *
  * Semantics follow the reference's clustering stack: a candidate stay is a
  * weighted Gaussian position estimate accumulated observation-by-
  * observation (`spatial/src/main/com/thymeflow/spatial/location/cluster/
  * MaxLikelihoodCluster.scala:60-101`), merged when the Hellinger distance
  * between distributions is small (`mathematics/src/main/com/thymeflow/
  * mathematics/HellingerDistance.scala:16-37`). Formulas here are the
  * standard textbook ones (precision-weighted mean; Hellinger distance of
  * isotropic bivariate normals), implemented independently.
  */
object Geo {

  /** Isotropic 2-D Gaussian position estimate in (lat, lon) with sigma in
    * meters; weight = precision accumulated so far. */
  final case class PositionEstimate(
      lat: Double, lon: Double, sigmaMeters: Double, weight: Double, n: Int,
      firstTimeMs: Long, lastTimeMs: Long)

  object PositionEstimate {
    def single(lat: Double, lon: Double, accuracyMeters: Double, timeMs: Long): PositionEstimate = {
      val sigma = math.max(accuracyMeters, 1.0)
      PositionEstimate(lat, lon, sigma, 1.0 / (sigma * sigma), 1, timeMs, timeMs)
    }
  }

  /** Precision-weighted merge of an observation into a running estimate
    * (maximum-likelihood update for Gaussian means with known variances). */
  def merge(c: PositionEstimate, lat: Double, lon: Double, accuracyMeters: Double,
      timeMs: Long): PositionEstimate = {
    val sigma = math.max(accuracyMeters, 1.0)
    val w = 1.0 / (sigma * sigma)
    val total = c.weight + w
    PositionEstimate(
      lat = (c.lat * c.weight + lat * w) / total,
      lon = (c.lon * c.weight + lon * w) / total,
      sigmaMeters = math.sqrt(1.0 / total),
      weight = total,
      n = c.n + 1,
      firstTimeMs = math.min(c.firstTimeMs, timeMs),
      lastTimeMs = math.max(c.lastTimeMs, timeMs))
  }

  /** Squared Hellinger distance between two isotropic bivariate normals
    * N(mu1, s1²I), N(mu2, s2²I):
    * H² = 1 − (2·s1·s2/(s1²+s2²)) · exp(−d²/(4·(s1²+s2²)))
    * with d the ground distance between means. */
  def hellingerSq(
      lat1: Double, lon1: Double, s1: Double,
      lat2: Double, lon2: Double, s2: Double): Double = {
    val d = Haversine.distanceMeters(lat1, lon1, lat2, lon2)
    val varSum = s1 * s1 + s2 * s2
    val bc = (2.0 * s1 * s2 / varSum) * math.exp(-(d * d) / (4.0 * varSum))
    1.0 - bc
  }
}
