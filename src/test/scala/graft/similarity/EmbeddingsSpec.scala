package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {

  import spark.implicits._

  behavior of "Embeddings"

  private def vecs(n: Int, d: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i =>
      (i, Array.fill(d)(rnd.nextFloat() * 4 - 2)))
  }

  it should "match the explode-join formulation cell by cell" in {
    val df = vecs(80, 6, 1).toDF("vec_id", "embedding")
    val got = Embeddings.gramMicro(df, "embedding", 1000L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val q = df.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        round(col("x").cast("double") * 1000).cast("long").as("q"))
    val want = q.as("a").join(q.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.q") * col("b.q")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    got shouldBe want
    got.size shouldBe 6 * 7 / 2
  }

  it should "be bit-identical under any partitioning" in {
    val df = vecs(200, 8, 2).toDF("vec_id", "embedding")
    val a = Embeddings.gramMicro(df.repartition(1), "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = Embeddings.gramMicro(df.repartition(17), "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    b shouldBe a
  }

  it should "quantize half away from zero like SQL round" in {
    Embeddings.quantize(1.5e-3, 1000) shouldBe 2L
    Embeddings.quantize(-1.5e-3, 1000) shouldBe -2L
    Embeddings.quantize(2.4e-3, 1000) shouldBe 2L
    Embeddings.quantize(-2.4e-3, 1000) shouldBe -2L
    Embeddings.quantize(0.0, 1000) shouldBe 0L
  }

  it should "recover a planted dominant direction via power iteration" in {
    // vectors ≈ t·u for a fixed direction u (plus small noise):
    // top eigenvector of XᵀX must align with u
    val rnd = new scala.util.Random(3)
    val u = Array(0.6, 0.0, 0.8, 0.0)
    val df = (0L until 300L).map { i =>
      val t = rnd.nextDouble() * 4 - 2
      (i, Array.tabulate(4)(j =>
        (t * u(j) + rnd.nextGaussian() * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    val gram = Embeddings.gramMicro(df, "embedding", 1000L)
    val (v, lambda) = Embeddings.topEigenvector(gram)
    lambda should be > 0.0
    val cos = math.abs(v.zip(u).map { case (a, b) => a * b }.sum) /
      math.sqrt(u.map(x => x * x).sum)
    cos should be > 0.99
  }
}
