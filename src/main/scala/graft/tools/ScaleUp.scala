package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an N× scale-up of the driver's parquet tables for
  * superlinear-cliff probes (r14 verdict #5: one 10× point over the five
  * most expensive bench queries, catching AQE switch-overs and
  * broadcast-threshold crossings the sf0.1 receipts can't see).
  *
  * Construction — copies are SALTED so the scaled workload keeps the
  * original's matching structure instead of degenerating:
  *
  *  - `lineitem`: keys remapped per copy (orderkey/partkey offset by the
  *    copy stride) → N disjoint subgraphs; PageRank/triangle shapes scale
  *    exactly N×.
  *  - `part`: each copy's `p_name` gets a copy-marker token appended —
  *    any extra token breaks the 0.999 soft-TF-IDF identity, so q41's
  *    match set scales exactly N× instead of gaining C(N,2) cross-copy
  *    pairs per name.
  *  - `documents`: each copy replaces ~30% of tokens (deterministic
  *    per-position hash) with copy-salted tokens → cross-copy Jaccard
  *    ~0.54, far under q133's 0.9 threshold (no quadratic cross-copy
  *    pair blowup), while ~70% of the term statistics — including q158's
  *    query terms — survive at N× scale.
  *  - `embeddings`: vectors get a small deterministic per-(id, dim)
  *    perturbation so copies aren't bit-identical (IVF list geometry
  *    stays realistic); ids offset by the copy stride.
  *
  * This is probe data for BENCH_NOTES scaling receipts, NOT oracle input
  * — correctness queries keep reading the driver's own tables.
  *
  * Usage: `runMain graft.tools.ScaleUp <srcSfDir> <outDir> [copies]`.
  */
object ScaleUp {

  private def stride(df: DataFrame, col0: String): Long = {
    // max() over an empty table is a NULL aggregate — fail with a message,
    // not an NPE (r15 review pass)
    val row = df.agg(max(col(col0).cast("long"))).head
    require(!row.isNullAt(0), s"cannot derive a copy stride: $col0 is empty")
    row.getLong(0) + 1
  }

  /** `partStride` must be the PART table's stride, not max(l_partkey)+1:
    * when the hottest part ids are not dense (some parts unreferenced),
    * the two maxima diverge and copy k's lineitem foreign keys would
    * land between part copies, silently breaking every lineitem⋈part
    * join in the scaled corpus (r15 review pass — dormant at the driver
    * SFs, where every part is referenced). */
  def lineitem(src: DataFrame, copies: Int, partStride: Long): DataFrame = {
    val orderStride = stride(src, "l_orderkey")
    explodeCopies(src, copies)
      .withColumn("l_orderkey", col("l_orderkey") + col("__copy") * orderStride)
      .withColumn("l_partkey", col("l_partkey") + col("__copy") * partStride)
      .drop("__copy")
  }

  def part(src: DataFrame, copies: Int): DataFrame = {
    val keyStride = stride(src, "p_partkey")
    explodeCopies(src, copies)
      .withColumn("p_partkey", col("p_partkey") + col("__copy") * keyStride)
      .withColumn("p_name",
        when(col("__copy") === 0, col("p_name"))
          .otherwise(concat(col("p_name"), lit(" copy"), col("__copy"))))
      .drop("__copy")
  }

  def documents(src: DataFrame, copies: Int): DataFrame = {
    val idStride = stride(src, "doc_id")
    explodeCopies(src, copies)
      .withColumn("text",
        when(col("__copy") === 0, col("text")).otherwise(
          // replace ~30% of tokens with copy-salted ones: deterministic
          // per (copy, position); array_join/transform stay codegen'd
          array_join(
            expr("""transform(split(text, ' '), (tok, i) ->
                    IF(pmod(hash(__copy, i), 10) < 3,
                       concat(tok, 'x', CAST(__copy AS STRING)), tok))"""),
            " ")))
      .withColumn("doc_id", col("doc_id") + col("__copy") * idStride)
      .drop("__copy")
  }

  def embeddings(src: DataFrame, copies: Int): DataFrame = {
    val idStride = stride(src, "vec_id")
    explodeCopies(src, copies)
      .withColumn("vec_id", col("vec_id") + col("__copy") * idStride)
      .withColumn("embedding",
        when(col("__copy") === 0, col("embedding")).otherwise(
          expr("""transform(embedding, (x, i) ->
                  CAST(x + pmod(hash(vec_id, i), 1000) / 1e6 AS FLOAT))""")))
      .drop("__copy")
  }

  private def explodeCopies(src: DataFrame, copies: Int): DataFrame =
    src
      .withColumn("__copy", explode(array((0 until copies).map(lit(_)): _*)))
      .withColumn("__copy", col("__copy").cast("long"))

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark: SparkSession = graft.GraftSession.builder("graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")
    def tbl(n: String) = graft.Tables(spark, srcDir, n)
    val partStride = stride(tbl("part"), "p_partkey")
    Seq(
      "lineitem" -> lineitem(tbl("lineitem"), copies, partStride),
      "part" -> part(tbl("part"), copies),
      "documents" -> documents(tbl("documents"), copies),
      "embeddings" -> embeddings(tbl("embeddings"), copies)
    ).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
