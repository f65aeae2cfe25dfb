package graft.text

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  "Pii.redact" should "redact emails, IPv4s and phones with counts" in {
    val df = Seq(
      (1L, "write bob.smith+spam@corp.example or call +1-555-123-4567 now"),
      (2L, "server at 192.168.0.17 and backup at 10.0.0.1"),
      (3L, "no pii here at all"),
      (4L, "two mails: a@b.io c.d@e.org one ip 8.8.8.8"))
      .toDF("id", "text")
    val out = Pii.redact(df, "text")
      .select("id", "redacted", "n_emails", "n_ips", "n_phones")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, "write [EMAIL] or call [PHONE] now", 1, 0, 1))
    out(1) shouldBe ((2L, "server at [IP] and backup at [IP]", 0, 2, 0))
    out(2) shouldBe ((3L, "no pii here at all", 0, 0, 0))
    out(3) shouldBe ((4L, "two mails: [EMAIL] [EMAIL] one ip [IP]", 2, 1, 0))
  }

  it should "redact emails before the narrower digit patterns" in {
    // the email's domain digits must not surface as a partial IP after
    // a hypothetical wrong-order replacement
    val out = Pii.redact(Seq((1L, "x1.2.3.4@a.org")).toDF("id", "text"), "text")
      .select("redacted").as[String].head()
    out shouldBe "[EMAIL]"
  }

  it should "not match phones without a leading plus or too few digits" in {
    val out = Pii.redact(Seq((1L, "room 555-1234 and +12 34")).toDF("id", "text"), "text")
      .select("redacted", "n_phones").as[(String, Int)].head()
    out shouldBe (("room 555-1234 and +12 34", 0))
  }
}
