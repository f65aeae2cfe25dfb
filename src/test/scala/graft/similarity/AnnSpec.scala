package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f, 0f)), // near 1
    (3L, Array(0f, 1f, 0f, 0f)),
    (4L, Array(0f, 0f, 1f, 0f)),
    (5L, Array(-1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")

  "cosine" should "be 1 for identical directions and 0 for orthogonal" in {
    val df = Seq((Array(1f, 2f, 3f), Array(2f, 4f, 6f), Array(3f, -1.5f, 0f)))
      .toDF("a", "b", "c")
    df.select(Ann.cosine($"a", $"b")).as[Double].head() shouldBe 1.0 +- 1e-12
    df.select(Ann.cosine($"a", $"c")).as[Double].head() shouldBe 0.0 +- 1e-12
  }

  // pins the r15 map-side Lloyd means (per-task (cent, count, sum-vector)
  // partials merged in partition-id order, replacing posexplode +
  // groupBy(cent, dim)): centroids must equal the naive per-list
  // element-wise means of the vectors assigned to the deterministic
  // init sample
  "kmeansCentroids" should "equal naive per-list means after one Lloyd round" in {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 40L).map { id =>
      (id, Array.fill(6)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("vec_id", "embedding")
    val nlist = 4
    val got = Ann.kmeansCentroids(df, "vec_id", "embedding", nlist, iterations = 1)
      .as[(Long, Array[Double])].collect().toMap

    // replicate the deterministic init sample and the assignment rule
    val init = df.select($"vec_id".cast("long"), $"embedding",
        xxhash64($"vec_id").as("h"))
      .orderBy($"h").limit(nlist)
      .as[(Long, Array[Float], Long)].collect()
      .map { case (id, v, _) => (id, v.map(_.toDouble)) }.sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val assigned = rows.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      val best = init.minBy { case (cid, cv) => (-cos(vd, cv), cid) }._1
      (best, vd)
    }
    val expect = assigned.groupBy(_._1).map { case (cid, grp) =>
      val dim = grp.head._2.length
      cid -> (0 until dim).map(d => grp.map(_._2(d)).sum / grp.size).toArray
    }
    got.keySet shouldBe expect.keySet
    for ((cid, ev) <- expect; (g, e) <- got(cid).zip(ev))
      withClue(s"list $cid") { g shouldBe e +- 1e-9 }
  }

  "bruteForceTopK" should "rank the nearest vector first" in {
    val top1 = Ann.bruteForceTopK(vecs, vecs.where($"vec_id" === 1), "vec_id", "embedding", 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    top1 shouldBe Set((1L, 2L))
    val top2 = Ann.bruteForceTopK(vecs, vecs.where($"vec_id" === 3), "vec_id", "embedding", 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    top2.head shouldBe 2L // cos(3,2) ≈ 0.11 is the only positive sim
  }

  "zero-norm embeddings" should "score 0.0 everywhere instead of crashing or hijacking" in {
    // one degenerate all-zero embedding in the corpus:
    //  - pre-fix, scoredPairs computed 0/0 = NaN and BigDecimal(NaN)
    //    THREW — one null embedding crashed the whole brute-force job;
    //  - the column cosine was 0/0 too — a DIVIDE_BY_ZERO error under
    //    Spark 4's ANSI default;
    //  - the kernel-wide rule is norm == 0 → sim 0.0 (assignNearest,
    //    the knnJoin cogroup), so all paths must agree on corpora
    //    containing a zero vector.
    val withZero = vecs.unionByName(
      Seq((6L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    // column cosine: 0.0, no error
    withZero.where($"vec_id" === 6)
      .select(Ann.cosine($"embedding", $"embedding")).as[Double].head() shouldBe 0.0
    // brute force neither crashes nor ranks the zero vector above real sims
    val bf = Ann.bruteForceTopK(withZero, withZero.where($"vec_id" === 1),
      "vec_id", "embedding", 6)
      .orderBy("rank").select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    bf.head._1 shouldBe 2L // the real near neighbor still wins
    bf.map(_._1) should contain(6L) // the zero vector ranks by sim 0.0
    // exhaustive knnJoin stays row-identical to brute force on the same corpus
    val viaJoin = Ann.knnJoin(withZero, withZero.where($"vec_id" === 1),
        "vec_id", "embedding", k = 6, nlist = 2, nprobe = 2,
        maxSim = Double.PositiveInfinity)
      .orderBy("rank").select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    viaJoin shouldBe bf
  }

  "thresholdPairs" should "find only the near-duplicate pair" in {
    Ann.thresholdPairs(vecs, "vec_id", "embedding", 0.95)
      .as[(Long, Long)].collect().toSet shouldBe Set((1L, 2L))
  }

  it should "refuse a corpus above maxExactN, naming the scale path" in {
    // the scaladoc's "O(n^2), small n only" contract is enforced at
    // runtime — an oversized corpus errors immediately instead of
    // launching a quadratic join
    val e = intercept[IllegalArgumentException] {
      Ann.thresholdPairs(vecs, "vec_id", "embedding", 0.95, maxExactN = 2)
    }
    e.getMessage should include ("lshPairs")
    e.getMessage should include ("SetSimJoin")
    // an explicit cap authorizes the small slice
    Ann.thresholdPairs(vecs, "vec_id", "embedding", 0.95, maxExactN = 10)
      .as[(Long, Long)].collect().toSet shouldBe Set((1L, 2L))
  }

  "lshPairs" should "recover the near-duplicate pair via bucketing" in {
    Ann.lshPairs(vecs, "vec_id", "embedding", 0.95, numPlanes = 8, tables = 4)
      .as[(Long, Long)].collect().toSet should contain((1L, 2L))
  }

  it should "hold recall@10 >= 0.9 vs brute force at the default nprobe" in {
    // CI-scale version of the SCALING.md 500k probe: a deterministic
    // 2k-vector corpus (16 base directions, per-replica jitter), 20
    // probes, auto-nlist (~45 lists), default nprobe=4. Pins the quality
    // claim the recall sweep documents.
    val dim = 16
    val corpus = spark.range(2000).toDF("vec_id")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(dim - 1)),
          i => (when(i === (col("vec_id") % dim).cast("int"), 10.0).otherwise(0.0) +
            (pmod(col("vec_id") * 31 + i * 7, lit(11)).cast("double") - 5) * 0.1)
            .cast("float")).as("embedding"))
      .localCheckpoint()
    val probes = corpus.where(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(corpus, probes, "vec_id", "embedding", 10)
      .select("probe_id", "neighbor_id")
    val nExact = exact.count()
    val hits = Ann.ivfTopK(corpus, probes, "vec_id", "embedding",
        k = 10, nlist = 0, nprobe = 4)
      .join(exact, Seq("probe_id", "neighbor_id"), "left_semi").count()
    (hits.toDouble / nExact) should be >= 0.9
  }

  "ivfTopK" should "return a ranked neighbor list per probe" in {
    val res = Ann.ivfTopK(vecs, vecs.where($"vec_id" === 1), "vec_id", "embedding",
      k = 2, nlist = 2, nprobe = 2)
      .select("probe_id", "neighbor_id", "rank").collect()
    res.length should be >= 1
    res.map(_.getInt(2)).min shouldBe 1
  }

  "ivfBuild/ivfQuery" should "match ivfTopK exactly for the same routing parameters" in {
    val probes = vecs.where($"vec_id" < 3)
    val direct = Ann.ivfTopK(vecs, probes, "vec_id", "embedding",
      k = 2, nlist = 2, nprobe = 2)
      .as[(Long, Long, Int)].collect().toSet
    val index = Ann.ivfBuild(vecs, "vec_id", "embedding", nlist = 2, numBuckets = 4)
    val viaIndex = Ann.ivfQuery(index, probes, "vec_id", "embedding", k = 2, nprobe = 2)
      .as[(Long, Long, Int)].collect().toSet
    viaIndex shouldBe direct
    direct should not be empty
  }

  it should "survive save/load with the partitioned list layout intact" in {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    val index = Ann.ivfBuild(vecs, "vec_id", "embedding", nlist = 2, numBuckets = 4)
    Ann.ivfSave(index, dir)
    // lists land as list_bucket=N partition directories (file-level pruning)
    new java.io.File(s"$dir/lists").listFiles()
      .count(_.getName.startsWith("list_bucket=")) should be >= 1
    val loaded = Ann.ivfLoad(spark, dir)
    loaded.numBuckets shouldBe 4
    val probes = vecs.where($"vec_id" < 3)
    val fresh = Ann.ivfQuery(index, probes, "vec_id", "embedding", k = 2, nprobe = 2)
      .as[(Long, Long, Int)].collect().toSet
    val reloaded = Ann.ivfQuery(loaded, probes, "vec_id", "embedding", k = 2, nprobe = 2)
      .as[(Long, Long, Int)].collect().toSet
    reloaded shouldBe fresh
  }

  "ivfBuild" should "reject a non-positive bucket count loudly" in {
    // pmod(x, 0) is null under non-ANSI SQL — silent empty joins otherwise
    an[IllegalArgumentException] should be thrownBy
      Ann.ivfBuild(vecs, "vec_id", "embedding", nlist = 2, numBuckets = 0)
  }

  "ivfAppend" should "route new vectors to existing lists without refitting" in {
    val index = Ann.ivfBuild(vecs, "vec_id", "embedding", nlist = 2, numBuckets = 4)
    val before = index.assigned.count()
    val fresh = Seq((100L, Array(0.95f, 0.312f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val grown = Ann.ivfAppend(index, fresh, "vec_id", "embedding")
    grown.assigned.count() shouldBe before + 1
    grown.centroids.collect() shouldBe index.centroids.collect() // no refit
    // the appended vector is findable through the normal query path:
    // the probe IS the appended vector, so it must rank first
    val probe = Seq((200L, Array(0.95f, 0.312f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val res = Ann.ivfQuery(grown, probe, "vec_id", "embedding", k = 1, nprobe = 2)
      .as[(Long, Long, Int)].collect()
    res.map(_._2) shouldBe Array(100L)
  }

  "knnJoin" should "equal bruteForceTopK exactly when routing is exhaustive" in {
    // nprobe >= nlist routes every probe to every list → the candidate
    // set is the full corpus and the join is exact. 200 vectors, 16 dims,
    // probes = the FULL corpus (the corpus-as-probes shape the serving
    // kernels cannot take).
    val dim = 16
    val corpus = spark.range(200).toDF("vec_id")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(dim - 1)),
          i => (when(i === (col("vec_id") % dim).cast("int"), 10.0).otherwise(0.0) +
            (pmod(col("vec_id") * 31 + i * 7, lit(11)).cast("double") - 5) * 0.1)
            .cast("float")).as("embedding"))
      .localCheckpoint()
    val index = Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 8)
    val got = Ann.knnJoin(index, corpus, "vec_id", "embedding", k = 5,
        nprobe = 8)
      .as[(Long, Long, Int)].collect().toSet
    val exact = Ann.bruteForceTopK(corpus, corpus, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().toSet
    got shouldBe exact
    got.size shouldBe 200 * 5
  }

  it should "match ivfQuery's routing recall at equal nprobe" in {
    val dim = 16
    val corpus = spark.range(500).toDF("vec_id")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(dim - 1)),
          i => (when(i === (col("vec_id") % dim).cast("int"), 10.0).otherwise(0.0) +
            (pmod(col("vec_id") * 31 + i * 7, lit(11)).cast("double") - 5) * 0.1)
            .cast("float")).as("embedding"))
      .localCheckpoint()
    val probes = corpus.where(col("vec_id") < 25)
    val index = Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 16)
    val viaJoin = Ann.knnJoin(index, probes, "vec_id", "embedding", k = 5,
        nprobe = 4)
      .as[(Long, Long, Int)].collect().toSet
    val viaQuery = Ann.ivfQuery(index, probes, "vec_id", "embedding", k = 5,
        nprobe = 4)
      .as[(Long, Long, Int)].collect().toSet
    viaJoin shouldBe viaQuery // identical routing + tie rules
  }

  it should "cut the near-dup band for batch hard-negative mining" in {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.999f, 0.001f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f)),
      (5L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val index = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 1)
    val got = Ann.knnJoin(index, emb.where($"vec_id" === 1), "vec_id",
        "embedding", k = 2, nprobe = 1, maxSim = 0.9)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    got shouldBe Array(5L, 3L) // same as the serving hardNegatives kernel
  }

  it should "return identical results under forced hot-list splitting" in {
    // a skewed corpus: 150 of 200 vectors in one tight blob → one hot
    // IVF list; tiny task caps force that list into probe-salt ×
    // corpus-salt tiles (psalts > 1 AND csalts > 1). The result set must
    // be bit-identical to the unsplit path for any salt counts.
    val dim = 8
    val corpus = spark.range(200).toDF("vec_id")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(dim - 1)),
          i => (when(col("vec_id") < 150,
              when(i === 0, 10.0).otherwise(0.0))
            .otherwise(
              when(i === (col("vec_id") % dim).cast("int"), 10.0).otherwise(0.0)) +
            (pmod(col("vec_id") * 31 + i * 7, lit(11)).cast("double") - 5) * 0.1)
            .cast("float")).as("embedding"))
      .localCheckpoint()
    val index = Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 4)
    val base = Ann.knnJoin(index, corpus, "vec_id", "embedding", k = 5,
        nprobe = 4)
      .as[(Long, Long, Int)].collect().toSet
    // maxPairsPerTask = 100 < |hot list| = 150 → balanced tiling engages
    // on both axes (8-probe × 12-row chunks: psalts > 1 AND csalts > 1)
    val split = Ann.knnJoin(index, corpus, "vec_id", "embedding", k = 5,
        nprobe = 4, maxSim = Double.PositiveInfinity,
        maxPairsPerTask = 100, maxProbesPerTask = 8)
      .as[(Long, Long, Int)].collect().toSet
    split shouldBe base
    split.size shouldBe 200 * 5
  }

  it should "co-partition through a cogroup with no probe-side collect" in {
    val dim = 8
    val corpus = spark.range(100).toDF("vec_id")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(dim - 1)),
          i => (when(i === (col("vec_id") % dim).cast("int"), 10.0).otherwise(0.0) +
            (pmod(col("vec_id") * 31 + i * 7, lit(11)).cast("double") - 5) * 0.1)
            .cast("float")).as("embedding"))
      .localCheckpoint()
    val index = Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 4)
    val plan = Ann.knnJoin(index, corpus, "vec_id", "embedding", k = 3,
      nprobe = 2).queryExecution.executedPlan.toString
    // both sides meet in a shuffled cogroup — the batch contract: the
    // probe side is a plan subtree (shuffle + sort), never a broadcast
    // or driver-side literal
    plan should include("CoGroup")
    (plan should not).include("BroadcastExchange")
  }

  "semanticDedup" should "collapse over-threshold groups to min-id keepers" in {
    // two tight cosine groups plus one isolated vector: the grouping is
    // invariant to how k-means splits them (pairs only need co-location,
    // and near-identical vectors share a nearest centroid)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.01f, 0.999f)),
      (5L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val res = Ann.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.99, nlist = 2)
      .select("id", "keep_id").as[(Long, Long)].collect().toMap
    res shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L)
  }

  "hardNegatives" should "skip the near-dup band and rank the rest" in {
    // probe 1; 2 is a near-duplicate (cos ~ 1), 5 is moderately close,
    // 3 orthogonal, 4 opposite: with maxSim = 0.9 the dup is excluded
    // and the informative negative (5) leads
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.999f, 0.001f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f)),
      (5L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val got = Ann.hardNegatives(emb, emb.where($"vec_id" === 1),
        "vec_id", "embedding", k = 2, maxSim = 0.9)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    got shouldBe Array(5L, 3L)
    // and without the band, the dup wins (sanity against bruteForceTopK)
    Ann.bruteForceTopK(emb, emb.where($"vec_id" === 1),
        "vec_id", "embedding", k = 1)
      .head().getLong(1) shouldBe 2L
  }
}
