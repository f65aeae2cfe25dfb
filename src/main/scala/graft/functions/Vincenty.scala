package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vincenty inverse geodesic distance on the WGS84 ellipsoid (Vincenty,
  * "Direct and Inverse Solutions of Geodesics on the Ellipsoid", Survey
  * Review 1975 — the public formulae) as a codegen Catalyst expression.
  * Counterpart of the reference's spheroid metric
  * (`spatial/src/main/com/thymeflow/spatial/geographic/metric/models/
  * WGS84SphereVincentyPointMetric.scala`,
  * `geodesics/calculator/VincentyUnitSphereDistanceCalculator.scala`) —
  * SURVEY F4, accurate to ~0.5 mm where the iteration converges.
  * Near-antipodal pairs where Vincenty's lambda iteration fails fall back
  * to the haversine distance (documented limitation of the 1975 scheme).
  */
case class Vincenty(lat1: Expression, lon1: Expression, lat2: Expression, lon2: Expression)
    extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    lat1.nullable || lon1.nullable || lat2.nullable || lon2.nullable

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Vincenty.distanceMeters(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la1, lo1, la2, lo2) =>
      s"graft.functions.Vincenty.distanceMeters($la1, $lo1, $la2, $lo2)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object Vincenty {
  // WGS84 ellipsoid
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val B = A * (1.0 - F)

  def distanceMeters(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    val l = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1.0 - F) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1.0 - F) * math.tan(math.toRadians(lat2)))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)
    var lambda = l
    var iter = 0
    var converged = false
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    while (iter < 100 && !converged) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      sinSigma = math.sqrt(
        (cosU2 * sinL) * (cosU2 * sinL) +
          (cosU1 * sinU2 - sinU1 * cosU2 * cosL) * (cosU1 * sinU2 - sinU1 * cosU2 * cosL))
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1.0 - sinAlpha * sinAlpha
      cos2SigmaM =
        if (cosSqAlpha == 0.0) 0.0 // equatorial line
        else cosSigma - 2.0 * sinU1 * sinU2 / cosSqAlpha
      val c = F / 16.0 * cosSqAlpha * (4.0 + F * (4.0 - 3.0 * cosSqAlpha))
      val lambdaPrev = lambda
      lambda = l + (1.0 - c) * F * sinAlpha *
        (sigma + c * sinSigma *
          (cos2SigmaM + c * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) // near-antipodal: the 1975 iteration diverges
      return Haversine.distanceMeters(lat1, lon1, lat2, lon2)
    val uSq = cosSqAlpha * (A * A - B * B) / (B * B)
    val bigA = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    val bigB = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    val deltaSigma = bigB * sinSigma *
      (cos2SigmaM + bigB / 4.0 *
        (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
          bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) *
            (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
    B * bigA * (sigma - deltaSigma)
  }
}
