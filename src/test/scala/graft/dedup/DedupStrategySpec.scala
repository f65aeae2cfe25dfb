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

  // pins the r15 sparse bitmap kernel (nonzero-word merge scan + length
  // filter + mirrored row pairing): the pair set must equal the join
  // plan's at BOTH corpus-size parities — the mirror trick pairs row i
  // with n−1−i, and an off-by-one at odd n would drop or double a row
  it should "produce identical pairs on randomized corpora of both parities" in {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 60).map(i => s"w$i")
    for (n <- Seq(41, 42)) {
      val rows = (0 until n).map { i =>
        val len = 4 + rnd.nextInt(10)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val d = rows.toDF("doc_id", "text")
      val viaBitmap = Dedup.ngramJaccardPairs(d, "text", "doc_id", k = 2, num = 1, den = 3)
        .as[(Long, Long)].collect().toSet
      val strD = d.select(concat(lit("d"), col("doc_id")).as("doc_id"), col("text"))
      val viaJoin = Dedup.ngramJaccardPairs(strD, "text", "doc_id", k = 2, num = 1, den = 3)
        .as[(String, String)].collect()
        .map { case (a, b) =>
          val (x, y) = (a.drop(1).toLong, b.drop(1).toLong)
          (math.min(x, y), math.max(x, y))
        }.toSet
      withClue(s"n=$n") {
        viaBitmap.map { case (a, b) => (math.min(a, b), math.max(a, b)) } shouldBe viaJoin
      }
    }
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

  "simhash combinatorial blocking" should
    "return the identical pair set for every chunk-table entry" in {
    // the output is exactly {pairs : hamming <= maxHamming} regardless of
    // the blocking granularity — 4 chunks (single-chunk keys), 7 chunks
    // (C(7,4)=35 combo keys) and 10 chunks (C(10,7)=120) must agree
    val by4 = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, chunks = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val by7 = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, chunks = 7)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val by10 = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, chunks = 10)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    by7 shouldBe by4
    by10 shouldBe by4
  }

  "simhash 10-chunk blocking" should "stay inside whole-stage codegen" in {
    // the inline column formulation's 120 xxhash64 calls at chunks=10 blow
    // janino's method limit and silently fall back to interpreted eval —
    // exactly on the >500 M-doc tier. The native simhash_combo_keys
    // expression must compile cleanly: with codegen fallback disabled a
    // janino failure throws instead of degrading, so a plain run IS the
    // assertion.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val by10 = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, chunks = 10)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val by4 = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, chunks = 4)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      by10 shouldBe by4
      by10 should not be empty
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  "simhash_combo_keys" should "match the inline xxhash64 column formulation bit-for-bit" in {
    val fps = docs.select($"doc_id",
        call_function("simhash64",
          call_function("xxhash64_tokens", lower($"text"))).as("fp"))
      .localCheckpoint()
    val bounds = Dedup.chunkBounds(7)
    def chunkVal(i: Int) = {
      val (off, w) = bounds(i)
      shiftright($"fp", off).bitwiseAND(lit((1L << w) - 1))
    }
    val colKeys = fps.select($"doc_id",
        array((0 until 7).combinations(4).toSeq.map(m => xxhash64(m.map(chunkVal): _*)): _*)
          .as("keys"))
      .as[(Long, Seq[Long])].collect().toMap
    val natKeys = fps.select($"doc_id",
        call_function("simhash_combo_keys", $"fp", lit(7), lit(3)).as("keys"))
      .as[(Long, Seq[Long])].collect().toMap
    natKeys shouldBe colKeys
  }

  "simhash_md5" should "match the conv(md5) column formulation bit-for-bit" in {
    val natFp = docs.select($"doc_id",
        call_function("simhash_md5", lower($"text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val colFp = docs
      .select($"doc_id",
        transform(graft.text.TextAnalysis.tokens(lower($"text")),
          t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")).as("hs"))
      .localCheckpoint()
      .select($"doc_id", Dedup.simhashFromHashes($"hs").as("fp"))
      .as[(Long, Long)].collect().toMap
    natFp shouldBe colFp
    // 60-bit family: the top nibble never sets
    all(natFp.values) should be < (1L << 60)
  }

  "simhash pairs" should "verify the Hamming bound on every returned pair" in {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3, chunks = 7)
      .select("hamming").as[Long].collect()
    all(pairs) should be <= 3L
  }

  "native text-hash expressions" should "match the column formulations bit-for-bit" in {
    // word_shingles vs wordShinglesFromTokens(tokens(...))
    val colShingles = docs
      .select($"doc_id", graft.text.TextAnalysis.tokens($"text").as("t"))
      .localCheckpoint()
      .select($"doc_id",
        graft.text.TextAnalysis.wordShinglesFromTokens($"t", 2).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val natShingles = docs
      .select($"doc_id", call_function("word_shingles", $"text", lit(2)).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    natShingles.view.mapValues(_.toSet).toMap shouldBe
      colShingles.view.mapValues(_.toSet).toMap

    // minhash_sigs vs minhashSignature on the same shingle arrays
    val base = docs.select($"doc_id",
      call_function("word_shingles", $"text", lit(2)).as("sh")).localCheckpoint()
    val colSig = base.select($"doc_id", Dedup.minhashSignature($"sh", 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val natSig = base.select($"doc_id",
        call_function("minhash_sigs", $"sh", lit(8)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    natSig shouldBe colSig

    // simhash64(xxhash64_tokens(lower(text))) vs the HOF simhash(text)
    val colFp = docs.select($"doc_id", Dedup.simhash($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    val natFp = docs.select($"doc_id",
        call_function("simhash64",
          call_function("xxhash64_tokens", lower($"text"))).as("fp"))
      .as[(Long, Long)].collect().toMap
    natFp shouldBe colFp
  }
}
