package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times SparkEntry's headline queries on
  * SPARK_GRAFT_SF_DIR, prints one JSON line for the driver. Queries are
  * executed end-to-end with a noop sink (full plan runs, nothing
  * materializes on the driver). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    // warm up the JVM/codegen paths once with the smallest query
    try SparkEntry.queries("q01_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val results = SparkEntry.benchQueries.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
