package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall gate for the IVF SERVING route (q207's configuration: persisted
  * index, k = 10, nprobe = 4, auto √n nlist). q199 pins the EXACT kernel
  * against a SQL oracle; the serving path is approximate by design, so
  * its contract is a recall floor vs the exact top-k — asserted here on a
  * deterministic clustered corpus (the shape IVF assumes: embedding
  * corpora cluster) and measured on the real tables by ScalingProbe's
  * `ivfServe` (SCALING.md). Also pins save→load serve fidelity: the
  * loaded index must serve row-identically to the in-memory one. */
class IvfServeSpec extends SparkSpec {
  import spark.implicits._

  private def lcg(x: Long): Long =
    x * 6364136223846793005L + 1442695040888963407L

  /** 2000 vectors, dim 16, 20 well-separated clusters + deterministic
    * LCG noise. */
  private lazy val corpus = {
    (0L until 2000L).map { id =>
      val c = (id % 20).toInt
      var s = lcg(id + 7)
      val v = Array.tabulate(16) { d =>
        s = lcg(s)
        val noise = ((s >>> 20) % 1000L) / 10000.0f // [0, 0.1)
        val center =
          (if (d == c % 16) 1.0f else 0.0f) +
            (if (d == (c * 7 + 3) % 16) 0.5f else 0.0f)
        center + noise
      }
      (id, v)
    }.toDF("vec_id", "embedding").localCheckpoint()
  }

  "the IVF serving route" should "meet the recall floor vs the exact top-k" in {
    val dir = java.nio.file.Files.createTempDirectory("ivfservespec").toString
    val probes = corpus.where($"vec_id" < 50)
    Ann.ivfSave(Ann.ivfBuild(corpus, "vec_id", "embedding"), dir)
    val loaded = Ann.ivfLoad(spark, dir)
    val served = Ann.ivfQuery(loaded, probes, "vec_id", "embedding",
        k = 10, nprobe = 4)
      .select($"probe_id", $"neighbor_id")
    val exact = Ann.bruteForceTopK(corpus, probes, "vec_id", "embedding",
        k = 10)
      .select($"probe_id", $"neighbor_id")
    val denom = exact.count()
    denom shouldBe 50L * 10
    val recall = served.intersect(exact).count().toDouble / denom
    // the committed floor for the q207 configuration: routing misses are
    // bounded because true neighbors share the probe's natural cluster
    recall should be >= 0.90
  }

  it should "serve row-identically from the persisted and in-memory index" in {
    val dir = java.nio.file.Files.createTempDirectory("ivfservespec2").toString
    val probes = corpus.where($"vec_id" % 100 === 3)
    val mem = Ann.ivfBuild(corpus, "vec_id", "embedding")
    Ann.ivfSave(mem, dir)
    val loaded = Ann.ivfLoad(spark, dir)
    def rows(ix: Ann.IvfIndex) =
      Ann.ivfQuery(ix, probes, "vec_id", "embedding", k = 10, nprobe = 4)
        .select($"probe_id", $"neighbor_id", $"rank")
        .as[(Long, Long, Int)].collect().toSeq.sorted
    rows(loaded) shouldBe rows(mem)
    // serving output shape: at most k ranked rows per probe, ranks 1..k
    val byProbe = rows(loaded).groupBy(_._1)
    byProbe.values.foreach { rs =>
      rs.map(_._3).sorted shouldBe (1 to rs.length)
      rs.length should be <= 10
    }
  }
}
