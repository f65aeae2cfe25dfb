package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.execution.FormattedMode

import graft.{GraftSession, SparkEntry}

/** Optimization-round measurement harness (guide §1/§7): run named
  * driver-contract queries through the bench's noop sink — TWICE, as
  * Bench does, so the second (repeat) pass is the steady-state number
  * the driver's repeat column reports — and write, per query,
  *   - cold + repeat wall seconds and eager-construction seconds,
  *   - per-JOB wall times for the repeat pass (the serial driver
  *     latency an eager collect/count/checkpoint chain pays),
  *   - a per-stage table for the repeat pass: task count, summed task
  *     time, shuffle read/write bytes — the "which stage is the time
  *     going to" answer the Spark UI would give, captured headless,
  *   - the POST-execution formatted plan (AQE final plan — shows
  *     runtime SMJ→BHJ conversions and ReusedExchange/AQEShuffleRead
  *     that the pre-execution dump cannot).
  *
  * Usage: runMain graft.tools.StageProbe <sfDir> <outDir> <q...> */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    new java.io.File(outDir).mkdirs()
    val spark = GraftSession.builder("stage-probe")
    spark.sparkContext.setLogLevel("ERROR")

    // the noop save runs its OWN QueryExecution (a write command wrapping
    // the frame's plan) — the df's queryExecution never executes, so its
    // AdaptiveSparkPlan stays initial. Capture the executed command's
    // plan here to see the AQE FINAL operators.
    @volatile var lastExecuted: String = ""
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        lastExecuted = qe.explainString(FormattedMode)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    final case class St(stage: Int, name: String, tasks: Int, taskMs: Long,
        shufReadMB: Double, shufWriteMB: Double, inputMB: Double,
        wallMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobWall = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(St(si.stageId, si.name.takeWhile(_ != '('),
          si.numTasks, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6,
          (for (a <- si.completionTime; b <- si.submissionTime)
            yield a - b).getOrElse(-1L)))
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(je.jobId, je.time)
        jobWall.add((je.jobId, (je.time - t0) / 1e3))
      }
    }

    def cleanup(): Unit =
      try {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }

    // one warmup (mirrors Bench)
    try SparkEntry.queries("q01_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    for (name <- names) {
      // cold pass
      val c0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val cold = (System.nanoTime() - c0) / 1e9
      cleanup()

      // repeat pass, instrumented
      val compileN0 = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
      stages.clear(); jobWall.clear(); jobStart.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val tPlan = (System.nanoTime() - t0) / 1e9 // eager construction cost
      lastExecuted = ""
      // poor-man's driver profiler: sample every thread's stacks during
      // the action, histogram interesting frames (guide §7.3, headless)
      val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        val keys = Seq("RuleExecutor", "QueryExecution", "Analyzer",
          "Optimizer", "CodeGenerator", "doCompile", "ClosureCleaner",
          "DAGScheduler", "TaskSchedulerImpl", "buildHashedRelation",
          "TorrentBroadcast", "zipWithIndex", "executeCollect", "JavaSerializer",
          "KryoSerializer", "canonicalized", "sameResult", "TreeNode",
          "QueryStageExec", "AdaptiveSparkPlanExec", "createQueryStages",
          "SQLAppStatusListener", "CleanerImpl", "Janino")
        while (sampling) {
          import scala.jdk.CollectionConverters._
          for ((t, st) <- Thread.getAllStackTraces.asScala
               if t.getState == Thread.State.RUNNABLE; f <- keys
               if st.exists(_.getClassName.contains(f)))
            frameCounts.merge(f, 1, (a, b) => a + b)
          Thread.sleep(25)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      df.write.format("noop").mode("overwrite").save()
      sampling = false
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)

      val out = new java.io.PrintStream(
        new java.io.FileOutputStream(s"$outDir/$name.txt"))
      import scala.jdk.CollectionConverters._
      val jw = jobWall.asScala.toSeq.sortBy(_._1)
      val compileN = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount - compileN0
      out.println(f"== $name: cold $cold%.3f s, repeat $dt%.3f s (construction $tPlan%.3f s), ${jw.size} jobs, $compileN codegen compiles in repeat ==")
      out.println("job walls (s): " +
        jw.map { case (id, w) => f"$id:$w%.2f" }.mkString(" "))
      out.println(f"job wall total: ${jw.map(_._2).sum}%.2f s")
      import scala.jdk.CollectionConverters._
      out.println("driver frame samples (25ms): " + frameCounts.asScala.toSeq
        .sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" "))
      out.println()
      out.println(f"${"stage"}%6s ${"tasks"}%6s ${"taskSec"}%8s ${"wallS"}%7s ${"shRdMB"}%8s ${"shWrMB"}%8s ${"inMB"}%8s  name")
      for (s <- stages.asScala.toSeq.sortBy(_.stage))
        out.println(f"${s.stage}%6d ${s.tasks}%6d ${s.taskMs / 1000.0}%8.2f ${s.wallMs / 1000.0}%7.2f ${s.shufReadMB}%8.2f ${s.shufWriteMB}%8.2f ${s.inputMB}%8.2f  ${s.name}")
      out.println()
      out.println("== final (post-execution) plan ==")
      // spin briefly: the execution listener fires asynchronously
      val deadline = System.nanoTime() + 2000000000L
      while (lastExecuted.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      out.println(if (lastExecuted.nonEmpty) lastExecuted
        else df.queryExecution.explainString(FormattedMode))
      lastExecuted = ""
      out.close()
      cleanup()
      println(f"$name%-22s cold $cold%7.3f s  repeat $dt%7.3f s  (construction $tPlan%.3f s, ${jw.size} jobs)")
    }
    spark.stop()
  }
}
