package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {

  behavior of "Html.extractText"

  it should "split on block tags and erase inline tags" in {
    Html.extractText(
      "<html><body><h1>Title</h1><p>Some <b>bold</b> and <i>italic</i>.</p></body></html>"
    ) shouldBe "Title\nSome bold and italic."
  }

  it should "drop comments, script and style with their content" in {
    Html.extractText(
      "<p>keep</p><!-- <p>gone</p> --><script>var x = 1 < 2; s = '</p>';</script>" +
        "<style>p { color: red }</style><p>also</p>"
    ) shouldBe "keep\nalso"
  }

  it should "decode entities and keep unknown ones literal" in {
    Html.extractText("<p>&quot;Tom &amp; Jerry&quot; &#189; &#x41; &unknown; &lt;tag&gt;</p>"
    ) shouldBe "\"Tom & Jerry\" ½ A &unknown; <tag>"
  }

  it should "collapse whitespace runs and drop empty lines" in {
    Html.extractText("<p>  a\n\t b  </p><p>   </p><div>c</div>") shouldBe "a b\nc"
  }

  it should "survive malformed markup without corrupting visible text" in {
    Html.extractText("<p>ok</p><p>trailing tail after a dangling <") shouldBe
      "ok\ntrailing tail after a dangling"
    Html.extractText("text <unclosed") shouldBe "text"
    Html.extractText("<script>never closed <p>hidden") shouldBe ""
  }

  behavior of "Html.extractMainText"

  it should "drop link-dominated boilerplate lines and keep content" in {
    val html =
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
        "<h1>Real heading</h1>" +
        "<p>A paragraph with one <a href='x'>small link</a> inside a lot of prose text.</p>" +
        "<footer><a href='/t'>Terms</a> <a href='/p'>Privacy</a></footer>"
    Html.extractMainText(html) shouldBe
      "Real heading\nA paragraph with one small link inside a lot of prose text."
  }

  it should "compute link density per line, nested anchors included" in {
    val lines = Html.extractLines("<p><a>one <a>two</a></a> three</p>")
    lines should have size 1
    lines.head.text shouldBe "one two three"
    // "one two" (incl. the joining space inside the anchor) is linked
    lines.head.linkChars shouldBe 7
    lines.head.chars shouldBe 13
  }

  behavior of "html_text expression"

  it should "match the JVM kernel through SQL and survive nulls" in {
    import spark.implicits._
    val df = Seq(
      (1L, "<nav><a>x</a> <a>y</a></nav><p>body text</p>"),
      (2L, null.asInstanceOf[String])
    ).toDF("id", "html")
    val got = df.select(col("id"),
        call_function("html_text", col("html")).as("t"))
      .as[(Long, Option[String])].collect().toMap
    got(1L) shouldBe Some("body text")
    got(2L) shouldBe None
  }
}
