package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Benchmark main: times SparkEntry's headline queries on
  * SPARK_GRAFT_SF_DIR, prints one JSON line for the driver. Queries are
  * executed end-to-end with a noop sink (full plan runs, nothing
  * materializes on the driver).
  *
  * Noise robustness: each query is run twice — the first (cold) timing
  * feeds the headline `total`/`queries` fields (driver contract), and a
  * second in-process repeat is reported under `queries_repeat` /
  * `total_repeat` so load spikes on a shared host are visible as
  * cold-vs-repeat divergence instead of silently poisoning the headline.
  * The full metrics JSON is also written to BENCH_OUT.json (bare file,
  * no sbt log decoration) so the driver never has to scrape logs. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    val loadAtStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    // CPU-steal accounting (field 8 of /proc/stat's cpu line): this is a
    // shared VM, and hypervisor steal is the one contention source the
    // load average cannot see — identical builds measured 24s vs 61s
    // repeat columns at "idle" load purely from steal windows. Recording
    // the delta makes a receipt interpretable: high steal_pct = the
    // HOST was contended, not the plan.
    def stealTicks(): Long =
      try {
        val l = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).get.trim.split("\\s+")
        l(8).toLong
      } catch { case _: Throwable => -1L }
    def totalTicks(): Long =
      try {
        val l = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).get.trim.split("\\s+")
        l.drop(1).map(_.toLong).sum
      } catch { case _: Throwable => -1L }
    val (steal0, ticks0) = (stealTicks(), totalTicks())

    // warm up the JVM/codegen paths once with the smallest query
    try SparkEntry.queries("q01_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Release anything a query left pinned in the BlockManager (cached
      // plans, localCheckpoint blocks from iterative operators): over a
      // 2×19-query run the leaked blocks otherwise accumulate into GC /
      // memory pressure that slows LATER queries — the repeat-slower-
      // than-cold signature of the round-7 driver artifact. Cleanup cost
      // is outside the timed window.
      try {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }
      dt
    }

    // optional name args select a subset for A/B iteration; the driver
    // passes none (full list)
    val only = args.toSet
    val list =
      if (only.isEmpty) SparkEntry.benchQueries
      else SparkEntry.benchQueries.filter(only)
    val cold = list.map(name => name -> runOnce(name))
    val repeat = list.map(name => name -> runOnce(name))

    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")

    val total = cold.map(_._2).sum
    val totalRepeat = repeat.map(_._2).sum
    // ambient host load (1-min avg at start and end of the run): cold
    // numbers on a shared host track this — recorded so round-over-round
    // comparisons can separate real regressions from load noise (see
    // BENCH_NOTES.md)
    val loadAtEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val (steal1, ticks1) = (stealTicks(), totalTicks())
    // report the core count the session actually ran with (the driver
    // benches at reduced SPARK_GRAFT_CPUS to measure scaling; printing
    // availableProcessors() made those receipts unreadable)
    val benchCpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val stealPct =
      if (steal0 < 0 || steal1 < 0 || ticks1 <= ticks0) -1.0
      else (steal1 - steal0) * 100.0 / (ticks1 - ticks0)
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jmap(cold)},"total_repeat":$totalRepeat%.3f,"queries_repeat":${jmap(repeat)},"load_avg_start":$loadAtStart%.2f,"load_avg_end":$loadAtEnd%.2f,"steal_pct":$stealPct%.2f,"cpus":$benchCpus,"sf":"$sfDir"}"""
    println(json)
    // subset runs never clobber the committed full-run artifact
    if (only.isEmpty)
      try Files.write(Paths.get("BENCH_OUT.json"), (json + "\n").getBytes(StandardCharsets.UTF_8))
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_OUT.json write failed: ${e.getMessage}") }
    spark.stop()
  }
}
