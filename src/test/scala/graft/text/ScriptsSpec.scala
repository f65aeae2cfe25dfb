package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScriptsSpec extends SparkSpec {
  import spark.implicits._

  private def profile(rows: (Long, String)*): Map[Long, Map[String, Any]] = {
    val df = Scripts.profile(rows.toSeq.toDF("doc_id", "text"), "text", "doc_id")
    df.collect().map { r =>
      r.getLong(0) -> df.columns.drop(1).zipWithIndex
        .map { case (c, i) => c -> r.get(i + 1) }.toMap
    }.toMap
  }

  "profile" should "count script classes exactly" in {
    val p = profile((1L, "Hej Привет 世界 ١٢٣ abc 42"))
    p(1L)("n_latin") shouldBe 6L // Hej abc
    p(1L)("n_cyrillic") shouldBe 6L // Привет
    p(1L)("n_han") shouldBe 2L // 世界
    p(1L)("n_digit") shouldBe 2L // 42 (the Arabic-Indic digits are not [0-9])
    p(1L)("n_space") shouldBe 5L
    p(1L)("dominant") shouldBe "cyrillic" // 6 vs 6 latin: tie -> alphabetical
  }

  it should "pick the dominant script by count" in {
    profile((1L, "Ελληνικά abc"))(1L)("dominant") shouldBe "greek"
    profile((2L, "mostly latin text Ω"))(2L)("dominant") shouldBe "latin"
  }

  it should "report none when no script characters are present" in {
    val p = profile((1L, "123 456 --- !!!"))
    p(1L)("dominant") shouldBe "none"
    p(1L)("n_other") shouldBe 6L // --- !!!
  }

  it should "balance the counts against n_chars" in {
    val p = profile((1L, "Σpélda 例 пример test 99\t!"))(1L)
    val sum = Seq("n_latin", "n_cyrillic", "n_greek", "n_han", "n_arabic",
      "n_digit", "n_space", "n_other").map(k => p(k).asInstanceOf[Long]).sum
    sum shouldBe p("n_chars")
  }
}
