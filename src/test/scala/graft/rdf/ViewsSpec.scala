package graft.rdf

import graft.SparkSpec
import graft.convert.Converters
import org.apache.spark.sql.functions._

class ViewsSpec extends SparkSpec {
  import spark.implicits._

  "Views" should "pivot converter output into typed entity rows" in {
    val raw =
      """Message-ID: <m1@host>
        |From: alice@example.com
        |To: bob@example.com, carol@example.com
        |Subject: Hello
        |
        |body""".stripMargin
    val quads = Converters.email(Seq(("d1", raw)).toDS()).toDF()

    val msgs = Views.emailMessages(quads)
    msgs.count() shouldBe 1
    val m = msgs.head()
    m.getAs[String]("headline") shouldBe "Hello"
    m.getAs[Seq[String]]("recipients").size shouldBe 2

    val agents = Views.agents(quads)
    agents.count() shouldBe 3
    agents.select(explode(col("emails")).as("e")).distinct().count() shouldBe 3
  }

  it should "handle subjects with missing optional predicates" in {
    val quads = Seq(
      ("a1", "rdf:type", "personal:Agent", 0.toByte, null: String, null: String, "g"),
      ("a1", "http://schema.org/name", "NoEmail Agent", 2.toByte, null: String, null: String, "g"))
      .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")
    val row = Views.agents(quads).head()
    row.getAs[String]("name") shouldBe "NoEmail Agent"
    row.getAs[Seq[String]]("emails") shouldBe Seq.empty
  }
}
