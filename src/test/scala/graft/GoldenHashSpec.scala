package graft

import org.apache.spark.sql.DataFrame

/** Cross-engine *stability* oracles for the implementation-defined
  * queries the DuckDB gate can only row-count (q70 language-id, q145
  * zlib compression, q76 image embeddings, q138 BPE merges, q50 IVF
  * recall): the exact sf0.001 output is pinned as a golden
  * sha-256. There is no external engine that restates a trigram
  * classifier or a DEFLATE ratio, so the contract is determinism — any
  * engine change that shifts a single byte of output fails loudly here
  * instead of sliding through a rows-only check.
  *
  * If this fails and you did NOT touch `text/TextAnalysis.langId` /
  * `text/Compression`, suspect a driver-side testdata regeneration
  * (see AllQueriesSpec scaladoc for the round-8 precedent) — recompute
  * the goldens only after confirming the engine output is otherwise
  * sane (TextAnalysisSpec fixture + CompressionSpec monotonicity stay
  * the semantic anchors).
  */
class GoldenHashSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Canonical digest: rows rendered `a|b|c`, sorted lexicographically,
    * newline-joined, sha-256 hex. Column order as selected; null → "". */
  private def digest(df: DataFrame): String = {
    val rows = df.collect()
      .map(r => (0 until r.length)
        .map(i => if (r.isNullAt(i)) "" else r.get(i).toString)
        .mkString("|"))
      .sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  "q70_langid" should "reproduce its pinned sf0.001 output byte-exactly" in {
    digest(SparkEntry.queries("q70_langid")(spark, dir)) shouldBe
      "be9482bb4806a80a0ffd85206f3328a73c2b3c0f66240004fa487ff37c8965d4"
  }

  it should "reproduce its pinned sf0.01 output byte-exactly (second scale)" in {
    // cheap insurance that the pinned golden covers the CURRENT model
    // path: the sf0.001 hash above was pinned rounds ago; a kernel
    // change that happens to preserve the 500-doc output could still
    // shift the 5,000-doc one
    digest(SparkEntry.queries("q70_langid")(spark, "/root/testdata/sf0.01")) shouldBe
      "6774a5bbe73af77c7bf1f7ca393e3e433c1e5888cc676d0cd7592a15055667f5"
  }

  "q145_compression" should "reproduce its pinned sf0.001 output byte-exactly" in {
    digest(SparkEntry.queries("q145_compression")(spark, dir)) shouldBe
      "b024d2a588c58d61f1bc901a6d0bfa57ee8607fc670c8dcf860e08889a3659a3"
  }

  "q76_image_embed" should "reproduce its pinned sf0.001 output byte-exactly" in {
    digest(SparkEntry.queries("q76_image_embed")(spark, dir)) shouldBe
      "4019fc0e8ee3d13c554d846c74eedb59ebeae899c3a91e608187273f92adee18"
  }

  "q138_bpe_tokens" should "reproduce its pinned sf0.001 output byte-exactly" in {
    digest(SparkEntry.queries("q138_bpe_tokens")(spark, dir)) shouldBe
      "7c65f577e6610f06bade77a2a6248736ec75029a24608e23af40ced700fba1ca"
  }

  "q50_ann_ivf" should "reproduce its pinned sf0.001 output byte-exactly" in {
    digest(SparkEntry.queries("q50_ann_ivf")(spark, dir)) shouldBe
      "9cf5f3f1a7145dd738c3d401a82fff6e256f295eb2f55fceeebf331c47b8d4d8"
  }
}
