package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Throwaway: quantify fixed per-task overhead (not a deliverable). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("scratch")
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var lines = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        lines ::= f"    stage ${si.stageId}%3d tasks=${si.numTasks}%3d cpuSec=${si.taskMetrics.executorRunTime / 1000.0}%7.2f"
      }
    })
    def run(label: String)(f: => Unit): Unit = {
      lines = Nil
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $label%-50s wall $dt%7.3f s")
      lines.reverse.foreach(println)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables(spark, dir, "documents")
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      run("range(64 parts) trivial count")(
        spark.range(0, 6400, 1, 64).select(sum(col("id"))).head())
      run("range(32 parts) trivial count")(
        spark.range(0, 6400, 1, 32).select(sum(col("id"))).head())
      run("range(8 parts) trivial count")(
        spark.range(0, 6400, 1, 8).select(sum(col("id"))).head())
      run("range(64) mapPartitions identity") {
        import spark.implicits._
        spark.range(0, 6400, 1, 64).as[Long].mapPartitions(it => it)
          .select(sum(col("value"))).head()
      }
      run("tokenize repart 64")(
        noop(docs.repartition(64).select(col("doc_id"),
          explode(array_distinct(graft.text.TextAnalysis.tokens(lower(col("text"))))).as("tok"))))
      run("tokenize repart 32")(
        noop(docs.repartition(32).select(col("doc_id"),
          explode(array_distinct(graft.text.TextAnalysis.tokens(lower(col("text"))))).as("tok"))))
      run("tokenize repart 8")(
        noop(docs.repartition(8).select(col("doc_id"),
          explode(array_distinct(graft.text.TextAnalysis.tokens(lower(col("text"))))).as("tok"))))
      run("tokenize no repart")(
        noop(docs.select(col("doc_id"),
          explode(array_distinct(graft.text.TextAnalysis.tokens(lower(col("text"))))).as("tok"))))
    }
    spark.stop()
  }
}
