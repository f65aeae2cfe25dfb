package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Ad-hoc stage profiler for the q30/q28 bench regression: attaches a
  * stage listener and prints per-stage task counts and durations for the
  * end-to-end query, so the slow stage is measured rather than guessed.
  * Not part of the driver contract — a diagnosis tool. */
object ProfileQ30 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("profile-q30")
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ListBuffer[(Int, Int, Long, Long, String)]()
    val details = mutable.ListBuffer[(Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        val cpu = i.taskMetrics.executorRunTime
        stages += ((i.stageId, i.numTasks, wall, cpu, i.name.takeWhile(_ != '\n').take(60)))
        if (wall > 1000) details += ((i.stageId, i.details))
      }
    })

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(SparkEntry.queries("q01_agg")(spark, dir)) // warmup

    val name = if (args.nonEmpty) args(0) else "q30_token_blocking"
    for (i <- 1 to 3) {
      stages.clear()
      val t0 = System.nanoTime()
      noop(SparkEntry.queries(name)(spark, dir))
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name run $i: $total%.3f s, ${stages.size} stages")
      stages.sortBy(-_._3).take(12).foreach { case (id, n, wall, cpu, nm) =>
        println(f"[profile]   stage $id%4d tasks=$n%4d wall=${wall}%5d ms cpuSum=${cpu}%6d ms  $nm")
      }
      if (i == 1) details.foreach { case (id, d) =>
        println(s"[detail] stage $id:\n" + d.linesIterator.take(8).map("    " + _).mkString("\n"))
      }
    }
    spark.stop()
  }
}
