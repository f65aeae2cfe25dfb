package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkSpec {

  behavior of "Blocklist automaton"

  it should "match overlapping and nested patterns like the textbook example" in {
    // the classic AC example: {he, she, his, hers}
    val a = Blocklist.build(Seq("he", "she", "his", "hers"))
    a.matchedIds("ushers").toSeq shouldBe Seq(0, 1, 3) // he, she, hers
    a.matchedIds("this").toSeq shouldBe Seq(2)
    a.matchedIds("hex").toSeq shouldBe Seq(0)
    a.matchedIds("xyz").toSeq shouldBe Seq()
    a.containsAny("ushers") shouldBe true
    a.containsAny("usher") shouldBe true // "she" and "he" complete early
    a.containsAny("zzz") shouldBe false
  }

  it should "agree with naive contains over random inputs" in {
    val pats = Seq("ab", "bc", "abc", "ca", "aaa", "cb")
    val a = Blocklist.build(pats)
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(20)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val naive = pats.zipWithIndex.filter { case (p, _) => s.contains(p) }.map(_._2)
      withClue(s"text=$s") { a.matchedIds(s).toSeq shouldBe naive }
    }
  }

  it should "report a long-list match in time linear in the text" in {
    // 5k patterns that mostly share prefixes; one 100k-char text
    val pats = (0 until 5000).map(i => s"term${i}x")
    val a = Blocklist.build(pats)
    val text = ("filler " * 14000) + "term4321x" + (" tail" * 200)
    a.matchedIds(text).toSeq shouldBe Seq(4321)
  }

  behavior of "blocklist expressions"

  it should "evaluate through SQL with the automaton built at plan time" in {
    import spark.implicits._
    val pats = array(Seq("spark", "join", "window").map(lit): _*)
    val df = Seq((1L, "a spark join runs"), (2L, "nothing here"),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select(col("id"),
        call_function("blocklist_any", col("t"), pats).as("any"),
        array_join(call_function("blocklist_hits", col("t"), pats), ",").as("hits"))
      .as[(Long, Option[Boolean], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got(1L) shouldBe ((Some(true), Some("spark,join")))
    got(2L) shouldBe ((Some(false), Some("")))
    got(3L) shouldBe ((None, None))
  }
}
