package graft.tools

/** Prints q41's FINAL adaptive plan (post-execution), where AQE's
  * runtime decisions — stage reuse, SMJ->BHJ conversion, coalescing —
  * are visible, unlike the static explain dump. Diagnosis tool. */
object Q41Final {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("q41final")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q41_agent_match")(spark, "/root/testdata/sf0.1")
    df.queryExecution.executedPlan.execute().count()
    val s = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    println(s.take(12000))
    spark.stop()
  }
}
