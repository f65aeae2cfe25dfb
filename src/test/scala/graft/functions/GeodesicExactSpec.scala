package graft.functions

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Exact inverse geodesic: cross-validated against (a) the independent
  * Vincenty implementation where it converges, (b) published WGS84
  * closed-form constants, (c) Karney's published near-antipodal example
  * where Vincenty FAILS (the reason KarneyGeodeticCalculator exists in
  * the reference). */
class GeodesicExactSpec extends AnyFlatSpec with Matchers {

  private def d(lat1: Double, lon1: Double, lat2: Double, lon2: Double) =
    GeodesicExact.distanceMeters(lat1, lon1, lat2, lon2)

  "GeodesicExact" should "agree with Vincenty to sub-mm where Vincenty converges" in {
    val pts = Seq(
      (48.8566, 2.3522), (40.7128, -74.0060), (-33.8688, 151.2093),
      (35.6762, 139.6503), (-1.2921, 36.8219), (64.1466, -21.9426),
      (0.0, 0.0), (12.5, -70.0), (-45.0, 170.0), (89.0, 10.0))
    for {
      (la1, lo1) <- pts
      (la2, lo2) <- pts
      if (la1, lo1) != (la2, lo2)
    } {
      val v = Vincenty.distanceMeters(la1, lo1, la2, lo2)
      val g = d(la1, lo1, la2, lo2)
      math.abs(v - g) should be < 1e-3 // both sub-mm methods
    }
  }

  it should "reproduce the published WGS84 closed forms" in {
    // quarter meridian: 10 001 965.729 m (WGS84)
    d(0, 0, 90, 0) shouldBe 10001965.729 +- 0.01
    // pole-to-pole (also the equatorial-antipodes geodesic, over a pole)
    d(-90, 0, 90, 0) shouldBe 2 * 10001965.729 +- 0.02
    d(0, 0, 0, 180) shouldBe 2 * 10001965.729 +- 0.02
    // short equatorial arc: s = a·λ exactly
    d(0, 0, 0, 1) shouldBe (6378137.0 * math.toRadians(1.0)) +- 1e-6
    // symmetry and zero
    d(10, 20, -40, 70) shouldBe d(-40, 70, 10, 20) +- 1e-9
    d(12.34, 56.78, 12.34, 56.78) shouldBe 0.0
  }

  it should "converge on Karney's near-antipodal example where Vincenty fails" in {
    // Karney (2013) §1: Vincenty's λ-iteration fails to converge for
    // (0°, 0°) → (0.5°, 179.5°); the true geodesic is 19 936 288.579 m
    d(0, 0, 0.5, 179.5) shouldBe 19936288.579 +- 0.5
    // smooth approach to the antipode — no divergence, no jumps
    val near = (0 to 10).map(i => d(0, 0, 0.5, 179.0 + i * 0.1))
    all(near) should (be > 1.98e7 and be < 2.004e7)
    near.sliding(2).foreach { case Seq(p, n) =>
      math.abs(n - p) should be < 30000.0
    }
  }

  it should "stay in the hemisphere bound everywhere (antipodal sweep)" in {
    for (lat <- -80 to 80 by 16; dlon <- Seq(179.0, 179.9, 180.0)) {
      val s = d(lat, 10, -lat, 10 + dlon)
      s should be <= 2.0004e7
      s should be >= 1.9e7
    }
  }
}
