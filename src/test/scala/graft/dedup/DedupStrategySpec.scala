package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-strategy invariants of the dedup family: the adaptive physical
  * plans must agree with each other, and the approximate path must be a
  * verified subset of the exact one. */
class DedupStrategySpec extends SparkSpec {
  import spark.implicits._

  // a corpus with planted near-dups over a moderately sized vocabulary
  private lazy val docs = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0 until 120).map { i =>
      val toks = (0 until 12).map(j => words((i * 7 + j * 3) % words.size))
      (i.toLong, toks.mkString(" "))
    }
    // planted near-duplicates: one-token edits of the first 10 docs
    val dups = (0 until 10).map { i =>
      (1000L + i, base(i)._2.replaceFirst("\\w+$", "omega"))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  "bitmap and join Jaccard plans" should "produce identical pairs" in {
    val viaAuto = Dedup.ngramJaccardPairs(docs, "text", "doc_id", k = 2, num = 1, den = 3)
      .as[(Long, Long)].collect().toSet // small corpus -> bitmap path
    // force the join plan by making ids non-integral (string ids disable
    // the bitmap path) and compare on the same underlying pairs
    val strDocs = docs.select(concat(lit("d"), col("doc_id")).as("doc_id"), col("text"))
    val viaJoin = Dedup.ngramJaccardPairs(strDocs, "text", "doc_id", k = 2, num = 1, den = 3)
      .as[(String, String)].collect()
      .map { case (a, b) =>
        val (x, y) = (a.drop(1).toLong, b.drop(1).toLong)
        (math.min(x, y), math.max(x, y))
      }.toSet
    val normAuto = viaAuto.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    normAuto shouldBe viaJoin
    normAuto should not be empty
  }

  "minhash LSH pairs" should "be a subset of the exact Jaccard pairs" in {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", k = 2, num = 1, den = 3)
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id",
      k = 2, numHashes = 32, bands = 16, num = 1, den = 3)
      .as[(Long, Long)].collect().toSet
    lsh.subsetOf(exact) shouldBe true // verification guarantees precision
    // with 16 bands of 2 rows, recall on jaccard>1/3 planted dups is high
    lsh should not be empty
  }

  "simhash near-dup pairs" should "include every exact duplicate" in {
    val withExact = docs.union(Seq((2000L, docs.head().getString(1))).toDF("doc_id", "text"))
    val pairs = Dedup.simhashPairs(withExact, "text", "doc_id", maxHamming = 0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs should contain((0L, 2000L))
  }
}
