package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al., ACL 2016) — learn a
  * merge table from the corpus and apply it at scale. This is the real
  * token-counting primitive for training-data budgeting: the regex
  * token counts (q17) approximate cost, a BPE vocabulary measures it in
  * the units the model actually consumes.
  *
  * Scale split, stated explicitly:
  *  - the CORPUS-sized work is word counting — one distributed
  *    explode + count shuffle, linear in bytes;
  *  - the merge LOOP runs on the collected vocabulary (words × counts),
  *    which is bounded (10⁴–10⁶ types under any Zipf corpus, vs 10¹¹
  *    documents) — the same vocabulary-is-the-fixed-point argument as
  *    `TextAnalysis.vocab`. `maxVocab` gates the driver copy; beyond it,
  *    merges are learned from the top `maxVocab` types by (count, word)
  *    — a documented learning-time truncation that never affects
  *    ENCODING exactness given a merge table;
  *  - applying merges is embarrassingly parallel: a broadcast rank map
  *    and a per-partition greedy kernel, no shuffle at all.
  *
  * Determinism: pair-count ties break on the lexicographically smallest
  * pair, vocabulary truncation ties on the word — identical merges on
  * every run and partitioning.
  */
object Bpe {

  /** End-of-word sentinel (kept out of the corpus alphabet by the
    * tokenizer, which strips whitespace/punctuation). */
  val Eow = "</w>"

  private def wordSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  /** Learn up to `numMerges` merges from the corpus word distribution. */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 200000): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(maxVocab)
      .as[(String, Long)].collect()
    learnFromCounts(words, numMerges)
  }

  /** Merge loop on an in-memory (word, count) vocabulary. */
  def learnFromCounts(vocab: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Vector[String], Long)] =
      vocab.map { case (w, c) => (wordSymbols(w), c) }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
        i += 1
      }
    }
    merges.result()
  }

  /** Left-to-right, non-overlapping single-pair merge. */
  private def mergeOnce(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Greedy encode of one word: repeatedly apply the present pair with
    * the lowest merge rank (the standard BPE inference order). */
  def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = wordSymbols(word)
    var cont = true
    while (cont && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (best == null) cont = false
      else syms = mergeOnce(syms, best)
    }
    syms
  }

  /** (id, bpe token array): tokenize, encode every word, concatenate.
    * Broadcast ranks + per-row kernel — shuffle-free. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = Option(text).getOrElse("")
          .split("[\\s\\p{Punct}]+").iterator.filter(_.nonEmpty)
          .flatMap(w => encodeWord(w, ranksB.value)).toSeq
        (id, toks)
      }
      .toDF("id", "bpe_tokens")
  }

  /** (id, n_bpe_tokens): the budgeting projection. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    encode(df, idCol, textCol, merges)
      .select(col("id"), size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"))
}
