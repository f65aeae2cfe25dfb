package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the ScaleUp copy-salting construction (r15 review pass — the
  * tool was shipped in r14 without a spec): referential integrity of the
  * scaled foreign keys, disjointness of copies, the matching-structure
  * salts, and the empty-input guard. */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  "ScaleUp.lineitem" should "keep l_partkey joinable to the scaled part table when part ids are sparse in lineitem" in {
    // parts 1..5 exist but lineitem references ONLY part 2: pre-fix the
    // l_partkey stride came from max(l_partkey)+1 = 3 while part strode
    // by 6 — copy 1's foreign keys landed between part copies and every
    // lineitem⋈part join silently lost the scaled rows
    val part = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("p_partkey", "p_name")
    val li = Seq((10L, 2L), (11L, 2L)).toDF("l_orderkey", "l_partkey")
    val partStride = part.agg(max($"p_partkey")).head.getLong(0) + 1
    val scaledPart = ScaleUp.part(part, copies = 3)
    val scaledLi = ScaleUp.lineitem(li, copies = 3, partStride = partStride)
    scaledLi.count() shouldBe 6
    // every scaled foreign key resolves
    scaledLi.join(scaledPart, $"l_partkey" === $"p_partkey", "left_anti")
      .count() shouldBe 0
    // and each copy's lineitems hit that copy's part (2, 8, 14)
    scaledLi.select($"l_partkey").distinct().as[Long].collect().sorted shouldBe
      Seq(2L, 8L, 14L)
  }

  it should "fail loudly on an empty source instead of NPE" in {
    val empty = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
    val e = intercept[IllegalArgumentException] {
      ScaleUp.lineitem(empty, copies = 2, partStride = 10L)
    }
    e.getMessage should include("stride")
  }

  "ScaleUp.documents" should "salt copies below near-dup thresholds while copy 0 stays verbatim" in {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val scaled = ScaleUp.documents(docs, copies = 4).cache()
    scaled.count() shouldBe 4
    val texts = scaled.orderBy($"doc_id").select($"text").as[String].collect()
    texts(0) shouldBe "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // salted copies differ from the original and from each other
    texts.distinct.length shouldBe 4
    // ~30% token replacement: each salted copy keeps the token COUNT
    texts.foreach(_.split(" ").length shouldBe 10)
  }

  "ScaleUp.embeddings" should "perturb copies without changing dimension and keep ids disjoint" in {
    val emb = Seq((0L, Array(1f, 2f, 3f)), (1L, Array(4f, 5f, 6f)))
      .toDF("vec_id", "embedding")
    val scaled = ScaleUp.embeddings(emb, copies = 3).cache()
    scaled.count() shouldBe 6
    scaled.select($"vec_id").distinct().count() shouldBe 6
    scaled.select(org.apache.spark.sql.functions.size($"embedding"))
      .distinct().as[Int].collect() shouldBe Array(3)
    // copy 0 is bit-identical; perturbed copies stay within 1e-3 per dim
    val rows = scaled.orderBy($"vec_id")
      .select($"embedding").as[Array[Float]].collect()
    rows(0).toSeq shouldBe Seq(1f, 2f, 3f)
    rows.drop(2).zipWithIndex.foreach { case (v, i) =>
      val base = rows(i % 2)
      v.zip(base).foreach { case (a, b) =>
        math.abs(a - b) should be <= 1.1e-3f
      }
    }
  }
}
