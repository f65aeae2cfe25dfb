package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Columnar/text source-format coverage beyond parquet: ORC (the other
  * production columnar format Spark ships built-in), CSV, and JSON
  * lines — write/read round-trips preserving values and (for ORC)
  * types, plus ORC predicate pushdown reaching the scan. */
class FormatsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val data = (1L to 1000L).map(i =>
    (i, s"name$i", i * 1.5, (i % 7).toInt)).toDF("id", "name", "score", "grp")

  behavior of "format round-trips"

  it should "round-trip ORC with identical schema and values" in {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    data.write.mode("overwrite").orc(s"$dir/t")
    val back = spark.read.orc(s"$dir/t")
    // nullability widens through the file round-trip; names/types must hold
    back.schema.fields.map(f => (f.name, f.dataType)) shouldBe
      data.schema.fields.map(f => (f.name, f.dataType))
    back.orderBy("id").collect() shouldBe data.orderBy("id").collect()
  }

  it should "push filters into the ORC scan" in {
    val dir = java.nio.file.Files.createTempDirectory("orc2").toString
    data.write.mode("overwrite").orc(s"$dir/t")
    val q = spark.read.orc(s"$dir/t").where(col("id") === 42L)
    val scan = q.queryExecution.executedPlan.toString
    scan should include("PushedFilters")
    scan should include("id")
    q.count() shouldBe 1L
  }

  it should "round-trip CSV with an explicit schema" in {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    data.write.mode("overwrite").option("header", "true").csv(s"$dir/t")
    val back = spark.read.option("header", "true").schema(data.schema)
      .csv(s"$dir/t")
    back.orderBy("id").collect() shouldBe data.orderBy("id").collect()
  }

  it should "round-trip JSON lines" in {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    data.write.mode("overwrite").json(s"$dir/t")
    val back = spark.read.schema(data.schema).json(s"$dir/t")
    back.orderBy("id").collect() shouldBe data.orderBy("id").collect()
  }
}
