package graft.spatial

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Time-sequential stay extraction — the reference's flagship spatial
  * operator (`thymeflow/src/main/com/thymeflow/enricher/
  * LocationStayEnricher.scala:80-123` driving `spatial/.../
  * TimeSequentialClusterEstimator.scala:49-117`): stream location
  * observations in time order per user, grow a candidate cluster while each
  * new observation's distribution stays Hellinger-close to the cluster
  * estimate, emit clusters lasting >= minStay as stays.
  *
  * Spark shape (the scale plan): `repartition(user)` +
  * `sortWithinPartitions(user, time)` + `mapPartitions` carrying the
  * estimator state across rows — one shuffle, then a single streaming pass
  * per partition; no per-group buffering of whole users in memory beyond
  * the current cluster. This is the A9/§2.9 "order-dependent accumulation
  * is not a commutative Aggregator" design from the survey.
  */
object StayExtraction {

  final case class Obs(user: Long, timeMs: Long, lat: Double, lon: Double, accuracy: Double)
  final case class Stay(user: Long, start_ms: Long, end_ms: Long,
      lat: Double, lon: Double, n_obs: Int)

  /** Default thresholds from the reference (`LocationStayEnricher.scala:52-56`):
    * min stay 15 min, acceptance λ = 0.95 on the Hellinger DISTANCE H
    * (`location/Clustering.scala:161` thresholds
    * `HellingerDistance.normal`, the square root, ≤ λ — same scale as
    * [[WindowedStays]]). Internally the greedy scan compares the cheaper
    * H² ≤ λ², which is equivalent for H, λ ≥ 0 and skips a sqrt per
    * observation. */
  val DefaultMinStayMs: Long = 15L * 60 * 1000
  val DefaultLambda: Double = 0.95

  def extractStays(
      obs: Dataset[Obs],
      minStayMs: Long = DefaultMinStayMs,
      lambda: Double = DefaultLambda): Dataset[Stay] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .repartition(col("user"))
      .sortWithinPartitions(col("user"), col("timeMs"))
      .mapPartitions { it => new StayIterator(it, minStayMs, lambda) }
  }

  /** DataFrame adapter: (user, ts timestamp, lat, lon, accuracy). */
  def extractStaysDf(df: DataFrame, minStayMs: Long = DefaultMinStayMs,
      lambda: Double = DefaultLambda): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(
      col("user").cast("long").as("user"),
      unix_millis(col("ts").cast("timestamp")).as("timeMs"),
      col("lat").cast("double").as("lat"),
      col("lon").cast("double").as("lon"),
      col("accuracy").cast("double").as("accuracy")).as[Obs]
    extractStays(typed, minStayMs, lambda).toDF()
  }

  /** Carry-over state for incremental extraction: the currently-open
    * candidate cluster per user. */
  final case class OpenCluster(
      lat: Double, lon: Double, sigmaMeters: Double, weight: Double,
      n: Int, firstTimeMs: Long, lastTimeMs: Long) {
    def toEstimate: Geo.PositionEstimate =
      Geo.PositionEstimate(lat, lon, sigmaMeters, weight, n, firstTimeMs, lastTimeMs)
  }
  object OpenCluster {
    def from(e: Geo.PositionEstimate): OpenCluster =
      OpenCluster(e.lat, e.lon, e.sigmaMeters, e.weight, e.n, e.firstTimeMs, e.lastTimeMs)
  }

  /** Incremental (Structured Streaming) stay extraction: the stateful
    * variant of [[extractStays]] — SURVEY T9's optional incremental path.
    * State per user = the open candidate cluster; each micro-batch's
    * observations are processed in event-time order and completed stays
    * are emitted as soon as a cluster breaks. Assumes per-user in-order
    * delivery across batches (the reference re-runs from scratch per
    * trigger instead — both semantics are available here).
    *
    * Usage: `observations.groupByKey(_.user)` is applied internally; call
    * on a streaming Dataset[Obs] and write the result with update mode.
    */
  def extractStaysIncremental(
      obs: org.apache.spark.sql.Dataset[Obs],
      minStayMs: Long = DefaultMinStayMs,
      lambda: Double = DefaultLambda): org.apache.spark.sql.Dataset[Stay] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.user)
      .flatMapGroupsWithState[OpenCluster, Stay](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Obs], state: GroupState[OpenCluster]) =>
          val sorted = rows.toSeq.sortBy(o => (o.timeMs, o.lat, o.lon))
          var current = state.getOption.map(_.toEstimate)
          val out = scala.collection.mutable.ListBuffer[Stay]()
          def flush(c: Geo.PositionEstimate): Unit =
            if (c.lastTimeMs - c.firstTimeMs >= minStayMs)
              out += Stay(user, c.firstTimeMs, c.lastTimeMs, c.lat, c.lon, c.n)
          sorted.foreach { o =>
            current match {
              case Some(c) if Geo.hellingerSq(c.lat, c.lon, c.sigmaMeters,
                  o.lat, o.lon, math.max(o.accuracy, 1.0)) <= lambda * lambda =>
                current = Some(Geo.merge(c, o.lat, o.lon, o.accuracy, o.timeMs))
              case Some(c) =>
                flush(c)
                current = Some(Geo.PositionEstimate.single(o.lat, o.lon, o.accuracy, o.timeMs))
              case None =>
                current = Some(Geo.PositionEstimate.single(o.lat, o.lon, o.accuracy, o.timeMs))
            }
          }
          current match {
            case Some(c) => state.update(OpenCluster.from(c))
            case None => state.remove()
          }
          out.iterator
      }
  }

  /** Single streaming pass over a (user, time)-sorted partition. */
  private final class StayIterator(
      rows: Iterator[Obs], minStayMs: Long, lambda: Double) extends Iterator[Stay] {
    private var current: Option[(Long, Geo.PositionEstimate)] = None // (user, cluster)
    private var pending: List[Stay] = Nil

    private def flush(user: Long, c: Geo.PositionEstimate): Unit =
      if (c.lastTimeMs - c.firstTimeMs >= minStayMs)
        pending ::= Stay(user, c.firstTimeMs, c.lastTimeMs, c.lat, c.lon, c.n)

    private def advance(): Unit = {
      while (pending.isEmpty && rows.hasNext) {
        val o = rows.next()
        current match {
          case Some((u, c)) if u == o.user &&
              Geo.hellingerSq(c.lat, c.lon, c.sigmaMeters, o.lat, o.lon,
                math.max(o.accuracy, 1.0)) <= lambda * lambda =>
            current = Some((u, Geo.merge(c, o.lat, o.lon, o.accuracy, o.timeMs)))
          case Some((u, c)) =>
            flush(u, c)
            current = Some((o.user, Geo.PositionEstimate.single(o.lat, o.lon, o.accuracy, o.timeMs)))
          case None =>
            current = Some((o.user, Geo.PositionEstimate.single(o.lat, o.lon, o.accuracy, o.timeMs)))
        }
      }
      if (pending.isEmpty && !rows.hasNext) current.foreach { case (u, c) =>
        flush(u, c); current = None
      }
    }

    override def hasNext: Boolean = { advance(); pending.nonEmpty }
    override def next(): Stay = {
      advance()
      val h = pending.head; pending = pending.tail; h
    }
  }
}
