package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizedSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, d: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    // clustered vectors: 5 centers + noise, unequal per-dim ranges
    val centers = Array.fill(5, d)(rnd.nextFloat() * 4 - 2)
    (0L until n.toLong).map { i =>
      val c = centers((i % 5).toInt)
      (i, Array.tabulate(d)(j =>
        (c(j) + rnd.nextFloat() * 0.3f) * (j + 1)))
    }
  }

  "quantize" should "map lo/hi to the code range and be monotone" in {
    val scales = Array((0f, 10f), (-1f, 1f), (5f, 5f)) // last: degenerate
    val lo = Quantized.quantize(Array(0f, -1f, 5f), scales)
    val hi = Quantized.quantize(Array(10f, 1f, 5f), scales)
    lo(0) shouldBe -128; hi(0) shouldBe 127
    lo(1) shouldBe -128; hi(1) shouldBe 127
    lo(2) shouldBe 0 // degenerate dimension quantizes to a constant
    val mid = Quantized.quantize(Array(5f, 0f, 5f), scales)
    (mid(0) > lo(0) && mid(0) < hi(0)) shouldBe true
  }

  "fitScales/encode" should "produce one int8 code per dimension" in {
    val df = vecs(50, 8, 1).toDF("vec_id", "embedding")
    val scales = Quantized.fitScales(df, "embedding")
    scales.length shouldBe 8
    val enc = Quantized.encode(df, "vec_id", "embedding", scales)
    enc.select(expr("length(qvec)")).distinct().as[Int].collect() shouldBe
      Array(8)
  }

  "topK" should "equal the exact search when the rerank pool covers the corpus" in {
    val df = vecs(60, 6, 2).toDF("vec_id", "embedding")
    val probes = df.where($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int)].collect().toSet
    val quant = Quantized.topK(df, probes, "vec_id", "embedding",
      k = 3, rerank = 60) // pool = whole corpus -> stage 2 IS the exact search
      .as[(Long, Long, Int)].collect().toSet
    quant shouldBe exact
  }

  "ivfTopK" should "equal the exact search when probing every list with a full pool" in {
    val df = vecs(80, 8, 4).toDF("vec_id", "embedding")
    val probes = df.where($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int)].collect().toSet
    val quant = Quantized.ivfTopK(df, probes, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 4, rerank = 80)
      .as[(Long, Long, Int)].collect().toSet
    quant shouldBe exact
  }

  it should "keep high recall under routing + quantization" in {
    val df = vecs(300, 12, 5).toDF("vec_id", "embedding")
    val probes = df.where($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val got = Quantized.ivfTopK(df, probes, "vec_id", "embedding",
      k = 5, nlist = 6, nprobe = 3, rerank = 4)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    ((exact & got).size.toDouble / exact.size) should be >= 0.7
  }

  it should "reach high recall with a small rerank pool" in {
    val df = vecs(300, 12, 3).toDF("vec_id", "embedding")
    val probes = df.where($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val quant = Quantized.topK(df, probes, "vec_id", "embedding",
      k = 5, rerank = 4)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    recall should be >= 0.8
  }

  "pqTrain/pqEncode" should "produce m one-byte codes within codebook range" in {
    val df = vecs(120, 12, 6).toDF("vec_id", "embedding")
    val book = Quantized.pqTrain(df, "vec_id", "embedding", m = 3, ksub = 8)
    book.length shouldBe 3
    all(book.map(_.length)) should be <= 8
    all(book.flatMap(_.map(_.length))) shouldBe 4 // d/m subvector dims
    val enc = Quantized.pqEncode(df, "vec_id", "embedding", book)
    enc.select(expr("length(codes)")).distinct().as[Int].collect() shouldBe
      Array(3)
    // codes index into each subspace's codebook
    val codes = enc.select($"codes").as[Array[Byte]].collect()
    codes.foreach { c =>
      (0 until 3).foreach(j => (c(j) & 0xff) should be < book(j).length)
    }
  }

  "pqCode" should "pick the nearest codeword per subspace" in {
    // 2 subspaces of 2 dims, codewords on axes — nearest is unambiguous
    val book = Array(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)),
      Array(Array(0.0, 5.0), Array(5.0, 0.0)))
    Quantized.pqCode(Array(9f, 9f, 0.2f, 4.8f), book).toSeq shouldBe
      Seq(1.toByte, 0.toByte)
    Quantized.pqCode(Array(1f, 0f, 4.9f, 0.1f), book).toSeq shouldBe
      Seq(0.toByte, 1.toByte)
  }

  "pqTopK" should "equal the exact search when the rerank pool covers the corpus" in {
    val df = vecs(60, 8, 7).toDF("vec_id", "embedding")
    val probes = df.where($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int)].collect().toSet
    val pq = Quantized.pqTopK(df, probes, "vec_id", "embedding",
      k = 3, m = 4, ksub = 16, rerank = 60) // pool = whole corpus
      .as[(Long, Long, Int)].collect().toSet
    pq shouldBe exact
  }

  it should "keep high recall through ADC with a small rerank pool" in {
    val df = vecs(300, 12, 8).toDF("vec_id", "embedding")
    val probes = df.where($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", k = 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val pq = Quantized.pqTopK(df, probes, "vec_id", "embedding",
      k = 5, m = 4, ksub = 32, rerank = 6)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    ((exact & pq).size.toDouble / exact.size) should be >= 0.8
  }

  "knnJoinSq" should "match the exact batch join under exhaustive routing + full pool" in {
    val df = vecs(200, 10, 9).toDF("vec_id", "embedding")
    val index = Ann.ivfBuild(df, "vec_id", "embedding", nlist = 4)
    // exhaustive routing (nprobe = nlist) and a corpus-sized rerank pool:
    // the SQ stage can only reorder WITHIN the pool, and the exact rerank
    // restores the true order, so the result must equal the float join
    val got = Quantized.knnJoinSq(index, df, "vec_id", "embedding",
      k = 5, nprobe = 4, rerank = 40)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Int)].collect()
    val want = Ann.knnJoin(index, df, "vec_id", "embedding", k = 5, nprobe = 4)
      .orderBy("probe_id", "rank")
      .as[(Long, Long, Int)].collect()
    got shouldBe want
  }

  it should "return identical results under forced hot-list splitting" in {
    // same contract as Ann.knnJoin: the salted cogroup + per-(probe,
    // list) pool trim must be bit-identical to the unsplit path for any
    // salt counts (tiny caps force psalts > 1 and csalts > 1 here)
    val df = vecs(200, 10, 9).toDF("vec_id", "embedding")
    val index = Ann.ivfBuild(df, "vec_id", "embedding", nlist = 4)
    val base = Quantized.knnJoinSq(index, df, "vec_id", "embedding",
      k = 5, nprobe = 4, rerank = 4)
      .as[(Long, Long, Int)].collect().toSet
    val split = Quantized.knnJoinSq(index, df, "vec_id", "embedding",
      k = 5, nprobe = 4, rerank = 4,
      maxPairsPerTask = 30, maxProbesPerTask = 8)
      .as[(Long, Long, Int)].collect().toSet
    split shouldBe base
  }

  it should "keep high recall with the default rerank pool, both sides distributed" in {
    val df = vecs(300, 12, 10).toDF("vec_id", "embedding")
    val index = Ann.ivfBuild(df, "vec_id", "embedding", nlist = 4)
    val exact = Ann.knnJoin(index, df, "vec_id", "embedding", k = 5, nprobe = 4)
      .select("probe_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val sq = Quantized.knnJoinSq(index, df, "vec_id", "embedding",
      k = 5, nprobe = 4, rerank = 4)
    // the probe side must enter as a plan subtree (cogroup), never a
    // driver collect — the batch contract. (BroadcastExchange may still
    // appear: AQE broadcasts the small side of the RERANK joins at spec
    // scale, which is a planner choice over plan subtrees, not a driver
    // materialization — at corpus scale those sides exceed the
    // threshold and sort-merge instead.)
    val plan = sq.queryExecution.executedPlan.toString
    plan should include("CoGroup")
    val got = sq.select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    recall should be >= 0.9
  }
}
