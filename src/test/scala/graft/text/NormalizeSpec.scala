package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9" // café with U+00E9
  private val decomposed = "cafe\u0301" // e + combining acute

  "nfcCol" should "unify composed and decomposed spellings" in {
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "text")
    val keys = Normalize.nfcCol(df, "text", "nfc")
      .select(sha2(col("nfc"), 256)).as[String].collect()
    keys(0) shouldBe keys(1) // same dedup key after NFC
    // without normalization the keys differ — the bug this fixes
    df.select(sha2(col("text"), 256)).as[String].collect()
      .distinct.length shouldBe 2
  }

  it should "pass already-normalized text through unchanged (fast path)" in {
    val df = Seq((1L, "plain ascii stays identical")).toDF("id", "text")
    Normalize.nfcCol(df, "text", "nfc")
      .where(col("text") === col("nfc")).count() shouldBe 1
  }

  it should "preserve nulls" in {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    Normalize.nfcCol(df, "text", "nfc")
      .where(col("nfc").isNull).count() shouldBe 1
  }

  it should "match the JVM kernel through the native expression" in {
    val texts = Seq(composed, decomposed, "ẛ̣", "no marks", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Normalize.nfcCol(df, "text", "nfc")
      .orderBy("id").select("nfc").as[String].collect().toSeq
    got shouldBe texts.map(graft.functions.NormalizeKernels.nfcString)
  }

  "foldMarksCol" should "strip diacritics for match keys" in {
    val df = Seq((1L, composed), (2L, decomposed), (3L, "Ångström"))
      .toDF("id", "text")
    val out = Normalize.foldMarksCol(df, "text", "folded")
      .orderBy("id").select("folded").as[String].collect().toSeq
    out(0) shouldBe "cafe"
    out(1) shouldBe "cafe"
    out(2) shouldBe "Angstrom"
  }
}
