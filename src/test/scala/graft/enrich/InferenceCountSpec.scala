package graft.enrich

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InferenceCountSpec extends SparkSpec {
  import spark.implicits._

  private def stmts(rows: (String, String, String)*) = rows.toDF("s", "p", "o")
  private def counts(rows: (String, String, String, Long)*) =
    rows.toDF("s", "p", "o", "cnt")

  "updateInferenceCounts" should "retract only when the last derivation is removed" in {
    // (a,p,b) derived twice; removing one keeps it, removing both retracts
    val c0 = counts()
    val (c1, r1) = Inference.updateInferenceCounts(c0,
      stmts(("a", "p", "b"), ("a", "p", "b"), ("x", "p", "y")), stmts())
    r1.count() shouldBe 0
    c1.where($"s" === "a").select("cnt").as[Long].head() shouldBe 2

    val (c2, r2) = Inference.updateInferenceCounts(c1, stmts(), stmts(("a", "p", "b")))
    r2.count() shouldBe 0 // one derivation left
    c2.where($"s" === "a").select("cnt").as[Long].head() shouldBe 1

    val (c3, r3) = Inference.updateInferenceCounts(c2, stmts(), stmts(("a", "p", "b")))
    r3.as[(String, String, String)].collect().toSeq shouldBe Seq(("a", "p", "b"))
    c3.where($"s" === "a").count() shouldBe 0
    c3.where($"s" === "x").count() shouldBe 1 // untouched statement survives
  }

  "GraphML" should "serialize nodes and edges with escaping" in {
    val nodes = Seq(("n1", "Alice & Bob"), ("n2", "<x>")).toDF("id", "label")
    val edges = Seq(("n1", "n2", "knows")).toDF("src", "dst", "label")
    val xml = graft.sources.GraphML.serialize(nodes, edges)
    xml should include("""<node id="n1"><data key="label">Alice &amp; Bob</data></node>""")
    xml should include("&lt;x&gt;")
    xml should include("""<edge id="e0" source="n1" target="n2">""")
  }
}
