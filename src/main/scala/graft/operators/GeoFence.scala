package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Broadcast geofence (point-in-polygon) lookup — the 2-D sibling of
  * [[RangeLookup]]: a dimension-sized set of polygon fences ships to
  * every task as flat coordinate arrays, each probe point runs a
  * bounding-box reject plus an even-odd ray cast in a codegen'd
  * expression, and the matched fence's payload attaches via a broadcast
  * hash join on the fence index. ZERO exchanges on the point side — the
  * geofencing shape (zones, territories, geo-blocks) at 100 TB of GPS
  * events.
  *
  * Matching: fences are tested in the given order and the FIRST
  * containing fence wins — deterministic under overlap; callers with
  * disjoint fences get set semantics automatically. Ray casting is
  * even-odd with the usual half-open edge rule; points exactly ON a
  * fence edge are implementation-defined (as in every planar PIP
  * kernel) — keep fence bounds off your data grid.
  *
  * The reference's spatial stack stops at distance predicates
  * (`spatial/src/main/com/thymeflow/spatial/geographic/metric/models/
  * WGS84SphereHaversinePointMetric.scala:11-19`); polygon containment
  * is the natural curation extension for location corpora. */
object GeoFence {

  /** Even-odd ray cast; polygons flattened as (xs, ys) rings with
    * per-polygon offsets. Returns the first containing polygon index or
    * -1. */
  def contains(x: Double, y: Double, offsets: Array[Int],
      xs: Array[Double], ys: Array[Double],
      bounds: Array[Double]): Int = {
    var p = 0
    val nPoly = offsets.length - 1
    while (p < nPoly) {
      val b = p * 4
      if (x >= bounds(b) && x <= bounds(b + 1) &&
          y >= bounds(b + 2) && y <= bounds(b + 3)) {
        var inside = false
        val start = offsets(p)
        val end = offsets(p + 1)
        var i = start
        var j = end - 1
        while (i < end) {
          val yi = ys(i); val yj = ys(j)
          if ((yi > y) != (yj > y)) {
            val xCross = (xs(j) - xs(i)) * (y - yi) / (yj - yi) + xs(i)
            if (x < xCross) inside = !inside
          }
          j = i
          i += 1
        }
        if (inside) return p
      }
      p += 1
    }
    -1
  }

  /** `points` keeps every row; rows inside a fence gain the fence's
    * columns. `fences`: (tag columns..., ring) where `ring` is the
    * polygon as Seq[(x, y)] — passed programmatically because polygon
    * geometry is dimension metadata, not data. */
  def fenceJoin(points: DataFrame, xCol: String, yCol: String,
      fences: Seq[(String, Seq[(Double, Double)])]): DataFrame = {
    require(fences.nonEmpty, "need at least one fence")
    fences.foreach { case (tag, ring) =>
      require(ring.size >= 3, s"fence $tag needs at least 3 vertices") }
    val spark = points.sparkSession
    val offsets = fences.scanLeft(0)((acc, f) => acc + f._2.size).toArray
    val xs = fences.flatMap(_._2.map(_._1)).toArray
    val ys = fences.flatMap(_._2.map(_._2)).toArray
    val bounds = fences.flatMap { case (_, ring) =>
      Seq(ring.map(_._1).min, ring.map(_._1).max,
        ring.map(_._2).min, ring.map(_._2).max)
    }.toArray
    val idxCol = GraftColumnBridge.column(PolygonIndexOf(
      GraftColumnBridge.expression(col(xCol).cast("double")),
      GraftColumnBridge.expression(col(yCol).cast("double")),
      offsets, xs, ys, bounds))
    import spark.implicits._
    val dim = fences.map(_._1).zipWithIndex
      .map { case (tag, i) => (i, tag) }.toDF("__fence_idx", "fence_tag")
    points.withColumn("__fence_idx", idxCol)
      .join(broadcast(dim), Seq("__fence_idx"), "left")
      .drop("__fence_idx")
  }
}

/** Codegen'd point-in-polygon over broadcast-referenced flattened rings:
  * first containing fence index, null when outside all fences. */
case class PolygonIndexOf(left: Expression, right: Expression,
    offsets: Array[Int], xs: Array[Double], ys: Array[Double],
    bounds: Array[Double]) extends BinaryExpression {
  override def prettyName: String = "polygon_index_of"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"polygon_index_of needs (double, double), got $other")
    }
  override protected def nullSafeEval(x: Any, y: Any): Any = {
    val i = GeoFence.contains(x.asInstanceOf[Double], y.asInstanceOf[Double],
      offsets, xs, ys, bounds)
    if (i < 0) null else i
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offRef = ctx.addReferenceObj("fenceOffsets", offsets, "int[]")
    val xsRef = ctx.addReferenceObj("fenceXs", xs, "double[]")
    val ysRef = ctx.addReferenceObj("fenceYs", ys, "double[]")
    val bRef = ctx.addReferenceObj("fenceBounds", bounds, "double[]")
    val idx = ctx.freshName("fenceIdx")
    nullSafeCodeGen(ctx, ev, (xc, yc) => s"""
      int $idx = graft.operators.GeoFence.contains($xc, $yc, $offRef, $xsRef, $ysRef, $bRef);
      if ($idx < 0) { ${ev.isNull} = true; }
      else { ${ev.value} = $idx; }
    """)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
