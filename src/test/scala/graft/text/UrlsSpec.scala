package graft.text

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  "Urls.classify" should "extract host/domain, normalize, and flag blocklisted domains" in {
    val df = Seq(
      (1L, "HTTPS://Sub.Example.COM:8080/Path/?q=1#frag"),
      (2L, "http://user:pw@blog.spam-site.net/post/"),
      (3L, "https://example.com"),
      (4L, "not a url at all"))
      .toDF("id", "url")
    val out = Urls.classify(df, "url", Seq("spam-site.net"))
      .select("id", "host", "domain", "url_norm", "blocked")
      .as[(Long, String, String, String, Boolean)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, "sub.example.com", "example.com",
      "https://sub.example.com:8080/Path/?q=1", false))
    out(1) shouldBe ((2L, "blog.spam-site.net", "spam-site.net",
      "http://user:pw@blog.spam-site.net/post", true))
    out(2) shouldBe ((3L, "example.com", "example.com", "https://example.com", false))
    out(3) shouldBe ((4L, "", "", "not a url at all", false))
  }

  it should "keep query strings but strip fragments and one trailing slash" in {
    val out = Urls.classify(
      Seq((1L, "http://a.org/x/?k=v#sec"), (2L, "http://a.org/x/y/")).toDF("id", "url"),
      "url", Nil)
      .select("url_norm").as[String].collect().toSeq
    out shouldBe Seq("http://a.org/x/?k=v", "http://a.org/x/y")
  }
}
