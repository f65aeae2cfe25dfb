package graft.streaming

import graft.SparkSpec
import graft.similarity.Ann
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming kNN over a persisted IVF index: probe micro-batches served
  * against the on-disk index must (a) be cut-invariant — the union of
  * per-batch results equals one batch knnJoin over the union of probes —
  * and (b) pick up index appends landing between batches without a query
  * restart. */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def mkCorpus(n: Int, dim: Int) =
    spark.range(n).toDF("vec_id")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          sequence(lit(0), lit(dim - 1)),
          i => (when(i === (col("vec_id") % dim).cast("int"), 10.0).otherwise(0.0) +
            (pmod(col("vec_id") * 31 + i * 7, lit(11)).cast("double") - 5) * 0.1)
            .cast("float")).as("embedding"))
      .localCheckpoint()

  behavior of "StreamingAnn"

  it should "serve probe micro-batches cut-invariantly vs batch knnJoin on the union" in {
    implicit val sqlCtx = spark.sqlContext
    val corpus = mkCorpus(300, 16)
    val indexPath = tmp("ann-idx")
    Ann.ivfSave(Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 8),
      indexPath)

    val probeRows = corpus.where(col("vec_id") < 30)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (b1, b2) = probeRows.splitAt(13) // deliberately uneven cut

    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnn.start(stream.toDS().toDF("vec_id", "embedding"),
      indexPath, tmp("ann-ck"), "vec_id", "embedding", k = 5, nprobe = 4) {
      (res, _) =>
        seen.synchronized {
          seen ++= res.as[(Long, Long, Int)].collect()
        }
    }
    try {
      stream.addData(b1.toSeq: _*)
      q.processAllAvailable()
      stream.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val allProbes = corpus.where(col("vec_id") < 30)
    val viaJoin = Ann.knnJoin(Ann.ivfLoad(spark, indexPath), allProbes,
        "vec_id", "embedding", k = 5, nprobe = 4)
      .as[(Long, Long, Int)].collect().toSet
    seen.toSet shouldBe viaJoin
    seen.size shouldBe seen.toSet.size // no duplicate emission across cuts
  }

  it should "pick up index appends between batches without a restart" in {
    implicit val sqlCtx = spark.sqlContext
    val corpus = mkCorpus(200, 16)
    val indexPath = tmp("ann-idx-grow")
    Ann.ivfSave(Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 8),
      indexPath)

    // the appended batch: exact clones of vectors 24..33 under ids
    // 1024..1033 — those source vectors have no duplicate inside a
    // 200-vector corpus (the jitter formula repeats every 176 ids, so
    // only ids < 24 have an in-range twin), so each appended clone is
    // its probe's unique sim-1.0 neighbor and must become the new top-1
    val clones = mkCorpus(200, 16)
      .where(col("vec_id") >= 24 && col("vec_id") < 34)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
      .localCheckpoint()

    val perBatch =
      scala.collection.mutable.ArrayBuffer[Set[(Long, Long, Int)]]()
    val stream = MemoryStream[(Long, Array[Float])]
    val probeRows = corpus.where(col("vec_id") >= 24 && col("vec_id") < 34)
      .as[(Long, Array[Float])].collect().toSeq
    val q = StreamingAnn.start(stream.toDS().toDF("vec_id", "embedding"),
      indexPath, tmp("ann-grow-ck"), "vec_id", "embedding", k = 3,
      nprobe = 8) { (res, _) =>
      perBatch.synchronized {
        perBatch += res.as[(Long, Long, Int)].collect().toSet
      }
    }
    try {
      stream.addData(probeRows: _*)
      q.processAllAvailable()
      // grow the on-disk index mid-stream, then replay the same probes
      StreamingAnn.appendBatch(spark, indexPath, clones, "vec_id", "embedding")
      stream.addData(probeRows: _*)
      q.processAllAvailable()
    } finally q.stop()

    perBatch should have size 2
    // before the append: no neighbor from the appended id range
    perBatch(0).map(_._2).exists(_ >= 1000L) shouldBe false
    // after: every probe's top-1 is its appended clone, and the batch
    // result equals knnJoin against the GROWN index
    (24L until 34L).foreach { pid =>
      perBatch(1).find(t => t._1 == pid && t._3 == 1).map(_._2) shouldBe
        Some(pid + 1000L)
    }
    val grownExpect = Ann.knnJoin(Ann.ivfLoad(spark, indexPath),
        corpus.where(col("vec_id") >= 24 && col("vec_id") < 34), "vec_id",
        "embedding", k = 3, nprobe = 8)
      .as[(Long, Long, Int)].collect().toSet
    perBatch(1) shouldBe grownExpect
  }

  it should "compact grown buckets with bit-identical query results" in {
    val corpus = mkCorpus(200, 16)
    val indexPath = tmp("ann-idx-compact")
    Ann.ivfSave(Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 8),
      indexPath)
    // five small append batches: each adds a fragment file per touched
    // bucket — the unbounded small-file growth compaction exists for
    (0 until 5).foreach { r =>
      val batch = mkCorpus(200, 16).where(pmod(col("vec_id"), lit(5)) === r)
        .select((col("vec_id") + 1000L * (r + 1)).as("vec_id"),
          col("embedding"))
      StreamingAnn.appendBatch(spark, indexPath, batch, "vec_id", "embedding")
    }
    // appended exactly one base-corpus-worth of rows
    StreamingAnn.appendedFraction(spark, indexPath) shouldBe 1.0 +- 1e-9

    val probes = corpus.where(col("vec_id") < 25)
    def serve() = Ann.ivfQuery(Ann.ivfLoad(spark, indexPath), probes,
        "vec_id", "embedding", k = 5, nprobe = 4)
      .as[(Long, Long, Int)].collect().toSet
    val before = serve()
    val report = StreamingAnn.compactGrownBuckets(spark, indexPath,
      targetBytes = 64L << 20, minFiles = 2)
    report should not be empty
    report.foreach { case (_, nb, na) => na should be < nb }
    serve() shouldBe before // bit-identical results off the compacted files
    // compaction rewrote files, not rows
    StreamingAnn.appendedFraction(spark, indexPath) shouldBe 1.0 +- 1e-9

    // crash recovery: simulate a failure BETWEEN the two swap renames —
    // bucket dir moved aside to .compact_old_N, compacted dir not yet in
    // place. The next compaction call must restore the bucket (queries
    // would otherwise silently serve without its vectors) and produce
    // identical results.
    import org.apache.hadoop.fs.Path
    val fs = new Path(indexPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(new Path(s"$indexPath/lists")).toSeq
      .filter(_.getPath.getName.startsWith("list_bucket=")).head.getPath
    val bucketId = victim.getName.stripPrefix("list_bucket=")
    fs.rename(victim, new Path(s"$indexPath/.compact_old_$bucketId")) shouldBe true
    fs.mkdirs(new Path(s"$indexPath/.compact_new_$bucketId")) // orphan staging
    StreamingAnn.compactGrownBuckets(spark, indexPath,
      targetBytes = 64L << 20, minFiles = 2)
    fs.exists(victim) shouldBe true
    fs.exists(new Path(s"$indexPath/.compact_old_$bucketId")) shouldBe false
    fs.exists(new Path(s"$indexPath/.compact_new_$bucketId")) shouldBe false
    serve() shouldBe before
  }
}
