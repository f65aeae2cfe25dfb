package graft

/** Dumps the formatted physical plan of EVERY driver-contract query
  * (plan-quality audit — PLANS.txt). Full parity with the board: any
  * query in [[SparkEntry.queries]] is audited, so a BNLJ/cartesian scan
  * over the dump covers the whole surface, not a headline subset.
  * Queries whose construction runs driver-side fixpoints (closure,
  * PARIS, SCC, kmeans) execute them here exactly as Verify does — the
  * dump is the plan of the RETURNED frame, the one the driver hashes. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = new java.io.PrintStream(new java.io.FileOutputStream("/tmp/plans.txt"))
    val spark = GraftSession.builder("plans")
    spark.sparkContext.setLogLevel("ERROR")
    // optional: restrict the dump to the named queries (subset iteration
    // during plan work; the full-board audit passes no names)
    val only = args.drop(1).toSet
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    for (name <- names) {
      out.println(s"===== $name =====")
      out.println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      // entering the next query releases what this one pinned, the same
      // hygiene as the bench/probe runners
      try {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }
    }
    out.close(); spark.stop()
  }
}
