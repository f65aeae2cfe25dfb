package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, count_distinct}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  "stratifiedSample" should "keep exactly the rows whose Knuth draw clears the bucket rate" in {
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "a"),
      (6L, "b"), (7L, "b"), (8L, "b"), (9L, "b"), (10L, "b"))
      .toDF("id", "bucket")
    val rates = Map("a" -> 0.5, "b" -> 0.25)
    // reference draw computed independently on the driver
    def u(id: Long) = java.lang.Math.floorMod(id * 2654435761L, 1L << 32)
    val expected = (1L to 10L).filter { id =>
      val b = if (id <= 5) "a" else "b"
      u(id) < (rates(b) * (1L << 32)).toLong
    }.toSet
    val kept = Sampling.stratifiedSample(df, "id", "bucket", rates)
      .select("id").as[Long].collect().toSet
    kept shouldBe expected
    expected should not be empty // the fixture exercises both outcomes
    expected.size should be < 10
  }

  it should "keep unlisted buckets in full" in {
    val df = Seq((1L, "x"), (2L, "x")).toDF("id", "bucket")
    Sampling.stratifiedSample(df, "id", "bucket", Map("y" -> 0.0))
      .count() shouldBe 2
  }

  "epochMixture" should "repeat each row floor(rate) times plus a deterministic fractional epoch" in {
    val df = (1L to 20L).map(i => (i, if (i <= 10) "up" else "down")).toDF("id", "bucket")
    val rates = Map("up" -> 2.5, "down" -> 0.5)
    def u(id: Long) = java.lang.Math.floorMod(id * Sampling.EpochMultiplier, 1L << 32)
    val expected = (1L to 20L).flatMap { id =>
      val r = if (id <= 10) 2.5 else 0.5
      val n = r.toLong + (if (u(id) < ((r - r.toLong) * (1L << 32)).toLong) 1 else 0)
      (1L to n).map(e => (id, e))
    }.toSet
    val got = Sampling.epochMixture(df, "id", "bucket", rates)
      .select("id", "epoch").as[(Long, Long)].collect().toSet
    got shouldBe expected
    // the fixture must exercise both fractional outcomes in both buckets
    expected.count(_._2 == 3L) should (be > 0 and be < 10)
    expected.map(_._1).count(_ > 10) should (be > 0 and be < 10)
  }

  "rateSample" should "keep rows whose draw clears the per-row clamped rate" in {
    import org.apache.spark.sql.functions.{col, count_distinct}
    // rates: 2.0 clamps to 1 (always kept), -1.0 clamps to 0 (never),
    // 0.5 keeps iff draw < 2^31
    val df = Seq((1L, 2.0), (2L, -1.0), (3L, 0.5), (4L, 0.5), (5L, 0.5))
      .toDF("id", "rate")
    def u(id: Long) = java.lang.Math.floorMod(id * 2654435761L, 1L << 32)
    val expected = Seq(1L) ++ Seq(3L, 4L, 5L).filter(u(_) < (1L << 31))
    val kept = Sampling.rateSample(df, "id", col("rate"))
      .select("id").as[Long].collect().toSet
    kept shouldBe expected.toSet
    expected.size should (be > 1 and be < 4) // both outcomes exercised
  }

  it should "drop rate-0 buckets and run unlisted buckets for one epoch" in {
    val df = Seq((1L, "gone"), (2L, "other")).toDF("id", "bucket")
    val out = Sampling.epochMixture(df, "id", "bucket", Map("gone" -> 0.0))
      .select("id", "epoch").as[(Long, Long)].collect().toSeq
    out shouldBe Seq((2L, 1L))
  }

  "capPerGroup" should "rank within groups and flag the first cap rows" in {
    import org.apache.spark.sql.functions.{col, count_distinct}
    val df = Seq(
      ("a", 1L, 30L), ("a", 2L, 30L), ("a", 3L, 10L),
      ("b", 4L, 5L)).toDF("grp", "id", "len")
    val out = Sampling.capPerGroup(df, "grp",
        Seq(col("len").desc, col("id").asc), cap = 2)
      .select("id", "rnk", "kept").as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out shouldBe Map( // tie on len=30 broken by id asc; all rows returned
      1L -> ((1L, true)), 2L -> ((2L, true)), 3L -> ((3L, false)),
      4L -> ((1L, true)))
  }

  "k-smallest-priority sampling" should "merge exactly: sample(A ∪ B) == merge(sample(A), sample(B))" in {
    import org.apache.spark.sql.functions.{col, md5, concat, lit}
    // the mergeability behind the q131 quantile sketch, proven on splits
    def pri = md5(concat(col("id").cast("string"), lit(":q")))
    def sample(df: org.apache.spark.sql.DataFrame) =
      Sampling.capPerGroup(df.withColumn("pri", pri), "grp",
        Seq(col("pri").asc, col("id").asc), cap = 5)
        .where(col("kept")).select("grp", "id", "pri")
    val a = (1L to 40L).map(i => ("g" + (i % 2), i)).toDF("grp", "id")
    val b = (41L to 80L).map(i => ("g" + (i % 2), i)).toDF("grp", "id")
    val whole = sample(a.unionByName(b))
      .as[(String, Long, String)].collect().toSet
    val merged = sample(sample(a).unionByName(sample(b)))
      .as[(String, Long, String)].collect().toSet
    whole shouldBe merged
    whole.groupBy(_._1).values.foreach(_.size shouldBe 5)
  }

  "deterministicShuffle" should "match a JVM md5 reference order exactly" in {
    val df = (1L to 50L).toDF("id")
    val out = Sampling.deterministicShuffle(df, "id", "s1", buckets = 4)
      .as[(Long, String, Long, Long)].collect()
    def ref(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:s1".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    out.foreach { case (id, skey, bucket, _) =>
      skey shouldBe ref(id)
      bucket shouldBe (((skey(0).toInt * 131 + skey(1).toInt) * 131 +
        skey(2).toInt) * 131 + skey(3).toInt) % 4
    }
    // per-bucket positions are 1..n in skey order, every bucket non-empty
    out.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._4).toSeq shouldBe (1L to rows.length)
      rows.sortBy(_._4).map(_._2).toSeq shouldBe sorted.map(_._2).toSeq
    }
    out.map(_._3).distinct.length shouldBe 4
  }

  it should "be reproducible for a seed and differ across seeds" in {
    val df = (1L to 30L).toDF("id")
    def run(seed: String) = Sampling.deterministicShuffle(df, "id", seed, 4)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    run("a") shouldBe run("a")
    run("a").map(r => (r._3, r._4)) should not be
      run("b").map(r => (r._3, r._4))
  }

  "weightedSample" should "match a JVM A-ES reference selection" in {
    val df = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", col("w"), k = 40)
      .select("id").as[Long].collect().toSet
    // reference: same Knuth draw, same priority, same tie rule
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (1L to 500L).map { id =>
      val u = java.lang.Math.floorMod(id * 2654435761L, 1L << 32)
      val pri = r6(math.log((u + 1).toDouble / (1L << 32).toDouble) /
        (id % 7 + 1).toDouble)
      (id, pri)
    }.sortBy { case (id, pri) => (-pri, id) }.take(40).map(_._1).toSet
    got shouldBe want
    got.size shouldBe 40
  }

  it should "return exactly k rows and favor heavy weights" in {
    val df = (1L to 2000L).map(i =>
      (i, if (i <= 100) 50.0 else 1.0)).toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", col("w"), k = 200)
      .select("id").as[Long].collect()
    kept.length shouldBe 200
    // the 100 heavy rows are 50x likelier — nearly all should be in
    kept.count(_ <= 100L) should be > 70
  }

  it should "never sample non-positive weights" in {
    val df = Seq((1L, 0.0), (2L, -3.0), (3L, 1.0)).toDF("id", "w")
    Sampling.weightedSample(df, "id", col("w"), k = 10)
      .select("id").as[Long].collect().toSeq shouldBe Seq(3L)
  }

  it should "never let a NaN weight hijack the sample" in {
    // Spark's total ordering puts NaN above every double: pre-fix a NaN
    // weight passed the > 0 gate AND its NaN priority sorted FIRST under
    // desc, so the 0/0-quality rows displaced every legitimate row
    val df = Seq((1L, Double.NaN), (2L, 1.0), (3L, Double.NaN), (4L, 2.0))
      .toDF("id", "w")
    Sampling.weightedSample(df, "id", col("w"), k = 2)
      .select("id").as[Long].collect().toSet shouldBe Set(2L, 4L)
  }

  it should "drop NaN rates in rateSample instead of keeping everything" in {
    // least(greatest(NaN, 0), 1) = 1.0 under NaN-largest ordering: a NaN
    // quality score silently became keep-always pre-fix
    val df = Seq((1L, Double.NaN), (2L, 1.0), (3L, Double.NaN))
      .toDF("id", "rate")
    Sampling.rateSample(df, "id", col("rate"))
      .select("id").as[Long].collect().toSeq shouldBe Seq(2L)
  }

  "temperatureWeights" should "flatten shares toward uniform and normalize to one" in {
    // 80 / 15 / 5 split: α=0.3 upsamples the tail, downsamples the head
    val rows = (1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 95).map(i => (i.toLong, "mid")) ++
      (96 to 100).map(i => (i.toLong, "small"))
    val out = Sampling.temperatureWeights(rows.toDF("id", "src"), "src", 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // target shares sum to ~1 (rounding slack)
    val qSum = out.values.map(_._2).sum
    qSum should (be >= 999998L and be <= 1000002L)
    out("big")._3 should be < 1000000L    // head downsampled
    out("small")._3 should be > 1000000L  // tail upsampled
    // ordering still respected: big keeps the largest target share
    out("big")._2 should be > out("mid")._2
    out("mid")._2 should be > out("small")._2
  }

  it should "reduce to the identity at alpha = 1" in {
    val rows = (1 to 30).map(i => (i.toLong, if (i <= 20) "a" else "b"))
    val out = Sampling.temperatureWeights(rows.toDF("id", "src"), "src", 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out.foreach { case (_, (p, q, rate)) =>
      math.abs(q - p) should be <= 1L   // q == p up to ppm rounding
      math.abs(rate - 1000000L) should be <= 1L
    }
  }

  "leakageSafeSplit" should "never let a cluster straddle a split boundary" in {
    // 1000 docs in 200 clusters of 5
    val docs = (0L until 1000L).map(i => (i, i / 5)).toDF("doc_id", "cluster")
    val out = Sampling.leakageSafeSplit(docs, "cluster", Seq(8, 1, 1))
    out.groupBy("cluster").agg(count_distinct(col("split")).as("k"))
      .where(col("k") > 1).count() shouldBe 0L
    // proportions approximate the weights (hash-bucketed over 200 clusters)
    val bySplit = out.groupBy("split").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    bySplit.keySet.subsetOf(Set(0, 1, 2)) shouldBe true
    bySplit(0).toDouble / 1000 should be > 0.6
    bySplit.getOrElse(1, 0L).toDouble / 1000 should be < 0.3
  }

  it should "keep existing clusters' splits stable when the corpus grows" in {
    val docs = (0L until 500L).map(i => (i, i % 50)).toDF("doc_id", "cluster")
    val grown = (0L until 900L).map(i => (i, i % 90)).toDF("doc_id", "cluster")
    val a = Sampling.leakageSafeSplit(docs, "cluster", Seq(8, 1, 1))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sampling.leakageSafeSplit(grown, "cluster", Seq(8, 1, 1))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every doc present in both runs (clusters 0..49 kept their members
    // 0..499 where i%50 == i%90... restrict to ids < 450 whose cluster id
    // is unchanged between the two layouts)
    (0L until 450L).filter(i => i % 50 == i % 90).foreach { i =>
      b(i) shouldBe a(i)
    }
  }

  it should "reject empty or non-positive weights" in {
    val docs = Seq((1L, 1L)).toDF("doc_id", "cluster")
    an[IllegalArgumentException] should be thrownBy
      Sampling.leakageSafeSplit(docs, "cluster", Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Sampling.leakageSafeSplit(docs, "cluster", Seq(3, 0))
  }
}
