package graft.tools

import graft.functions.Similarity

/** Driver-side microbench of the softTfIdf kernel. Diagnosis tool. */
object SimBench {
  def main(a: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val vocab = Array("almond", "antique", "aquamarine", "azure", "beige",
      "bisque", "black", "blanched", "blue", "blush", "brown", "burlywood",
      "burnished", "chartreuse", "chiffon", "chocolate")
    def name() = Array.fill(5)(vocab(rnd.nextInt(vocab.length))).toSeq
    def ws() = Seq.fill(5)(1.0 + rnd.nextDouble())
    val pairs = Array.fill(100000)((name(), ws(), name(), ws()))
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      var acc = 0.0
      pairs.foreach { case (t1, w1, t2, w2) =>
        acc += Similarity.softTfIdf(t1, w1, t2, w2, 0.9, pruneBelow = 0.999)
      }
      println(f"[simbench] round $round: ${(System.nanoTime() - t0) / 1e9}%.3f s for 100k pairs (acc=$acc%.1f)")
    }
  }
}
