package graft.sources

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  "compact" should "merge a fragmented directory preserving every row" in {
    val in = java.nio.file.Files.createTempDirectory("compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("compact-out").toString + "/t"
    // 64 fragments of ~16 rows each
    (1L to 1024L).toDF("id").withColumn("payload",
        org.apache.spark.sql.functions.concat_ws("-",
          org.apache.spark.sql.functions.lit("row"), $"id"))
      .repartition(64).write.mode("overwrite").parquet(in)
    val rep = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    rep.filesBefore shouldBe 64L
    rep.filesAfter shouldBe 1L // everything fits one 1 GiB target
    rep.rows shouldBe 1024L
    spark.read.parquet(out).select("id").as[Long].collect().sorted shouldBe
      (1L to 1024L).toArray
    // input untouched
    spark.read.parquet(in).count() shouldBe 1024L
  }

  it should "split into multiple files when bytes exceed the target" in {
    val in = java.nio.file.Files.createTempDirectory("compact-in2").toString
    val out = java.nio.file.Files.createTempDirectory("compact-out2").toString + "/t"
    (1L to 5000L).toDF("id").repartition(20).write.mode("overwrite").parquet(in)
    val bytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val rep = Compaction.compact(spark, in, out, targetBytes = bytes / 3)
    rep.filesAfter should (be >= 3L and be < 20L)
    rep.rows shouldBe 5000L
  }

  it should "refuse an empty input directory" in {
    val in = java.nio.file.Files.createTempDirectory("compact-empty").toString
    an[IllegalArgumentException] should be thrownBy
      Compaction.compact(spark, in, in + "-out", 1024)
  }
}
