package graft.tools

import org.apache.spark.sql.functions._

import graft.enrich.{Resolution, AgentMatch}
import graft.functions.Similarity
import graft.text.TextAnalysis

/** A/B harness for the q41 scoring-stage placement: old formulation
  * (deterministic UDF, filter pushed into the join) vs new (pinned
  * full-width scoring stage). Diagnosis tool, not driver contract. */
object Q41Plan {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("q41ab")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val records = graft.Tables(spark, dir, "part")
    val (idCol, nameCol) = ("p_partkey", "p_name")

    val idf = Resolution.idf(records, nameCol, idCol).select(col("tok"), col("idf"))
    val toks = records.select(
        col(idCol).as("id"),
        explode(array_distinct(TextAnalysis.tokens(lower(col(nameCol))))).as("tok"))
      .join(idf, Seq("tok"))
      .groupBy("id")
      .agg(collect_list(col("tok")).as("toks"), collect_list(col("idf")).as("ws"))
    val candidates = Resolution.tokenBlockingCandidatesFrac(
      records, nameCol, idCol, 0.25, Some(200))
    println("candidates count: " + candidates.count())
    val joined = candidates
      .join(toks.select(col("id").as("id1"), col("toks").as("t1"), col("ws").as("w1")), "id1")
      .join(toks.select(col("id").as("id2"), col("toks").as("t2"), col("ws").as("w2")), "id2")
    println("joined count: " + joined.count())

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ab] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val detUdf = udf((t1: Seq[String], w1: Seq[Double], t2: Seq[String], w2: Seq[Double]) =>
      Similarity.softTfIdf(t1, w1, t2, w2, 0.9, pruneBelow = 0.999))
    val ndUdf = detUdf.asNondeterministic()

    for (i <- 1 to 3) {
      time(s"old: det udf, filter-in-join ($i)") {
        joined.withColumn("score", detUdf(col("t1"), col("w1"), col("t2"), col("w2")))
          .where(col("score") >= 0.999).select(col("id1"), col("id2"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"new: nondet udf above repartition ($i)") {
        joined.repartition(32)
          .withColumn("score", ndUdf(col("t1"), col("w1"), col("t2"), col("w2")))
          .where(col("score") >= 0.999).select(col("id1"), col("id2"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
