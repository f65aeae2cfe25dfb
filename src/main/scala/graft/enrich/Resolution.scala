package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution building blocks, Spark-first.
  *
  * Mirrors the semantics of the reference's inverse-functional-property
  * inferencer (`core/src/main/com/thymeflow/enricher/InverseFunctionalPropertyInferencer.scala:17-53`:
  * two entities sharing an email/phone/url value are the same) and the
  * candidate-generation stage of its fuzzy agent matcher
  * (`thymeflow/src/main/com/thymeflow/enricher/entityresolution/AgentMatchEnricher.scala:232-267`,
  * which delegates blocking to an Elasticsearch `minimum_should_match`
  * query). Here blocking is a token equi-join with IDF pruning — the
  * standard distributed replacement for a search-engine candidate pass.
  */
object Resolution {

  /** Inverse-functional-property pairs: ids agreeing on all `keyCols`.
    * A plain self-equi-join on the shared value — Catalyst plans a shuffle
    * hash join keyed on the value, and AQE splits skewed keys (hot values
    * like a shared provider domain). Output: (s1, s2), s1 < s2. */
  def ifpPairs(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    // statement-set semantics: a re-asserted (id, value) row is the same
    // evidence, not more of it
    val a = df.select((keyCols :+ idCol).map(col): _*).distinct()
    val b = df.select((keyCols :+ idCol).map(c => col(c).as(s"__$c")): _*).distinct()
    a.join(b, keyCols.map(c => col(c) === col(s"__$c")).reduce(_ && _) &&
        col(idCol) < col(s"__$idCol"))
      .select(col(idCol).as("s1"), col(s"__$idCol").as("s2"))
  }

  /** Widen a NARROW input before the CPU-heavy tokenize pass — see
    * [[graft.plans.Widen]] (byte-gated: a no-op at cluster scale). */
  private[graft] def widen(df: DataFrame): DataFrame = graft.plans.Widen(df)

  /** The tokenize subtree: a regex pass over the (widened) corpus,
    * shuffled by token. Consumers (document-frequency counts, the
    * blocking aggregation, IDF) each instantiate it; Catalyst's column
    * pruning then specializes every branch's scan to just the columns it
    * needs (the df-count branch reads only the text column), which is
    * the right trade at scale: map passes pipeline straight into their
    * shuffles with no materialization barrier, and AQE runs the branches
    * concurrently. The widen gate is what keeps each pass parallel on
    * narrow inputs. */
  private[enrich] def tokShuffled(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val wide = widen(df)
    wide.select(
        col(idCol).as("id"),
        explode(array_distinct(graft.text.TextAnalysis.tokens(lower(col(textCol))))).as("tok"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism * 2, col("tok"))
  }

  /** Token-blocking candidate join (SURVEY J3): explode normalized name
    * tokens, drop tokens appearing in more than `maxDocFreq` records (the
    * IDF-prune that replaces `minimum_should_match`; it is also the skew
    * guard — frequent tokens are exactly the skewed join keys), self-join on
    * token, dedupe pairs. Output: (id1, id2, shared_tokens). */
  def tokenBlockingCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDocFreq: Long): DataFrame =
    tokenBlockingCandidatesBy(df, textCol, idCol, lit(maxDocFreq), None, None)

  /** Same, with the doc-frequency cutoff as a fraction of the corpus size,
    * so the prune scales with the data instead of being an absolute knob.
    * `maxBlockSize` additionally caps each token's block (reference
    * searchSize semantics) — pass None for exhaustive candidates. */
  def tokenBlockingCandidatesFrac(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDocFreqFraction: Double,
      maxBlockSize: Option[Int] = None): DataFrame = {
    val n = df.select(count(lit(1)).as("__n"))
    tokenBlockingCandidatesBy(df, textCol, idCol,
      col("__n") * maxDocFreqFraction, Some(n), maxBlockSize)
  }

  /** Corpora under this optimizer-stats byte size take the FUSED
    * candidate plan: collect every token's id list in ONE aggregation and
    * derive the doc frequency from the list size — the fewest-stage shape,
    * but the collect runs BEFORE the hot-token prune, so a stop token
    * would buffer its whole block on one task. Only safe when the entire
    * corpus is broadcast-sized. Past the gate, plans count df first,
    * prune, and collect only surviving tokens' lists — bounded memory per
    * task under stop-token skew, the 100 TB shape. */
  private[enrich] val FuseBytes = 1L << 26

  private[enrich] def smallInput(df: DataFrame): Boolean = {
    // gate override (tests force the scale path on small fixtures; ops
    // can re-tune without a rebuild)
    val gate = df.sparkSession.conf
      .getOption("spark.graft.resolution.fuseBytes")
      .map(_.toLong).getOrElse(FuseBytes)
    df.queryExecution.optimizedPlan.stats.sizeInBytes < gate
  }

  private def tokenBlockingCandidatesBy(
      df: DataFrame,
      textCol: String,
      idCol: String,
      cutoff: org.apache.spark.sql.Column,
      nDf: Option[DataFrame],
      maxBlockSize: Option[Int]): DataFrame = {
    val toks = tokShuffled(df, textCol, idCol)
    if (smallInput(df)) {
      // fused small-corpus plan (see [[FuseBytes]]): df == size(ids), so
      // the count aggregation and its join back disappear
      val grouped = toks.groupBy(col("tok"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .withColumn("df", size(col("ids")).cast("long"))
      val rare = nDf.fold(grouped)(n => grouped.crossJoin(broadcast(n)))
        .where(col("df") <= cutoff)
      pairsFromIdLists(rare, maxBlockSize)
    } else {
      // document frequency per token; the corpus-count scalar (fractional
      // cutoff) joins AFTER the aggregation, onto the tiny per-token
      // table, so the broadcast never rides along with the exploded rows.
      // The prune lands BEFORE any id list is collected — see [[FuseBytes]].
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      val rare = nDf.fold(counts)(n => counts.crossJoin(broadcast(n)))
        .where(col("df") <= cutoff)
      pairsFromBlocks(toks, rare.select("tok"), maxBlockSize)
    }
  }

  /** The block→pair tail of token blocking, from a prepared (id, tok)
    * frame and the surviving token keys — exposed so composite resolvers
    * ([[AgentMatch]]) can hang it off the SAME tokenize/df-count
    * subtrees their scoring stages use instead of re-deriving them. */
  private[enrich] def pairsFromBlocks(
      toks: DataFrame,
      rareTokens: DataFrame,
      maxBlockSize: Option[Int]): DataFrame =
    pairsFromIdLists(
      toks
        .join(rareTokens, Seq("tok"))
        .groupBy(col("tok"))
        .agg(sort_array(collect_list(col("id"))).as("ids")),
      maxBlockSize)

  /** The pair-expansion tail: from per-block sorted id lists (an `ids`
    * column), apply the optional block cap — the distributed analogue of
    * the reference's searchSize=10000 candidate bound
    * (AgentMatchEnricher.scala:68), a slice of the sorted list:
    * deterministically the lowest ids, applied BEFORE the quadratic
    * expansion, no window, no extra exchange — then expand the strict
    * upper triangle in place and count shared blocks per pair. */
  private[enrich] def pairsFromIdLists(
      grouped: DataFrame,
      maxBlockSize: Option[Int]): DataFrame = {
    val capped = maxBlockSize match {
      case Some(cap) => grouped.select(slice(col("ids"), 1, cap).as("ids"))
      case None => grouped.select(col("ids"))
    }
    capped
      .select(posexplode(col("ids")).as(Seq("__i", "id1")), col("ids"))
      .select(col("id1"),
        explode(slice(col("ids"), col("__i") + lit(2), size(col("ids")))).as("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("shared_tokens"))
  }

  /** IDF weights per token over a corpus: idf = ln(N / df). N is joined in
    * as a broadcast scalar, not collected per-row. (Reference:
    * `EntityResolution.scala:133-140`.) Built on [[tokShuffled]] so the
    * regex pass stays parallel on narrow inputs. */
  def idf(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokShuffled(df, textCol, idCol)
    val n = df.select(countDistinct(col(idCol)).as("n_docs"))
    toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("tok"), col("df"), log(col("n_docs").cast("double") / col("df")).as("idf"))
  }

  /** Blended per-entity name distribution (reference A2,
    * `AgentMatchEnricher.scala:961-1003`): an entity's candidate names come
    * from two evidence sources — explicit contact records and message
    * occurrences. Contact evidence is trusted: when present it receives at
    * least `contactFloor` (default 0.5) of the probability mass; the rest
    * goes to message evidence proportionally. Weights sum to 1 per entity.
    *
    * Inputs: (id, name, n) counts per source. Output: (id, name, weight).
    */
  def blendedNameWeights(
      contactCounts: DataFrame,
      messageCounts: DataFrame,
      contactFloor: Double = 0.5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    val c = contactCounts.select(col("id"), col("name"), col("n"))
      .withColumn("src_weight", col("n").cast("double") / sum(col("n")).over(w))
      .withColumn("src", lit("contact"))
    val m = messageCounts.select(col("id"), col("name"), col("n"))
      .withColumn("src_weight", col("n").cast("double") / sum(col("n")).over(w))
      .withColumn("src", lit("message"))
    val both = c.unionByName(m)
    // contact share: contactFloor when both sources exist, 1 when only
    // contacts, 0 when only messages
    val hasContact = max(when(col("src") === "contact", 1).otherwise(0)).over(w)
    val hasMessage = max(when(col("src") === "message", 1).otherwise(0)).over(w)
    both
      .withColumn("contact_share",
        when(hasContact === 1 && hasMessage === 1, lit(contactFloor))
          .when(hasContact === 1, lit(1.0)).otherwise(lit(0.0)))
      .withColumn("weight",
        when(col("src") === "contact", col("src_weight") * col("contact_share"))
          .otherwise(col("src_weight") * (lit(1.0) - col("contact_share"))))
      .groupBy(col("id"), col("name"))
      .agg(sum(col("weight")).as("weight"))
  }

  /** Levenshtein similarity 1 - dist/maxLen (reference
    * `EntityResolution.scala:188-194`), as a Column. */
  def levenshteinSim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    lit(1.0) - levenshtein(a, b).cast("double") /
      greatest(length(a), length(b)).cast("double")
}
