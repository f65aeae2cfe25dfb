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
    * min stay 15 min, Hellinger-squared acceptance λ = 0.95. */
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
                math.max(o.accuracy, 1.0)) <= lambda =>
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
