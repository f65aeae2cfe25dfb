package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index BM25 retrieval — build / save / load / query, the
  * indexed successor of [[TextAnalysis.bm25]] (which re-tokenizes the
  * whole corpus per query; fine for analytics, wrong for serving).
  *
  * The reference delegates retrieval to an embedded Elasticsearch server
  * (`thymeflow/src/main/com/thymeflow/text/search/elasticsearch/FullTextSearchServer.scala:88-102`:
  * index the corpus once, then per-query candidate generation reads only
  * the postings of the query's terms). This is the Spark-native
  * equivalent: postings laid out so a query touches only the files that
  * can contain its terms.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - build is one tokenize pass → one (id, tok) aggregation; postings
  *     carry (tf, dl) so queries never join back to the corpus;
  *   - on disk, postings are hash-partitioned by term into
  *     `bucket=<pmod(xxhash64(tok), B)>` directories and sorted by term
  *     within files → a query prunes to |query-term buckets| directories
  *     (directory-level partition pruning) and row-group min/max stats
  *     prune within them;
  *   - term statistics (df, max_tf, min_dl) are query-side broadcast
  *     scalars, so scoring is a narrow pass over matched postings
  *     followed by one groupBy(id) whose width is the matched set, and
  *     top-k is TakeOrderedAndProject (per-partition heaps, no global
  *     sort);
  *   - rank-safe candidate pruning (the bulk-friendly half of WAND,
  *     Broder et al. 2003): a lower bound θ on the k-th best total score
  *     is taken from the rarest term's exact partial scores, and a doc
  *     survives only if some posting's exact weight plus the upper
  *     bounds of the OTHER query terms reaches θ. Docs that cannot reach
  *     θ are dropped BEFORE the per-doc aggregation; survivors are then
  *     scored over all their postings, so the result is identical to the
  *     unpruned top-k (spec-enforced). Doc-at-a-time pointer skipping —
  *     the other half of WAND — is inherently sequential and is not
  *     expressible in a bulk engine; the distributed wins are the bucket
  *     pruning and the pre-aggregation candidate cut.
  *
  * Scoring matches [[TextAnalysis.bm25]] exactly (same literals, same
  * association, round(6)) so the DuckDB oracle restates it verbatim.
  */
object InvertedIndex {

  /** Below this many matched postings (Σ query-term df) [[topK]] skips
    * the θ candidate cut: the cut's two serial driver jobs dominate the
    * aggregation they would shrink. Scale-adaptive by construction — a
    * 100 TB index's query terms match millions of postings and take the
    * cut; a small index skips it. */
  val ThetaCutMinPostings: Long = 100000L

  /** In-memory form of the index. `postings`: (tok, id, tf, dl);
    * `terms`: (tok, df, max_tf, min_dl); `n`/`sumDl` give exact avgdl.
    * `numBuckets` is set on a loaded index (its postings carry the
    * `bucket` partition column the writer laid out). */
  final case class Index(postings: DataFrame, terms: DataFrame,
      n: Long, sumDl: Long, numBuckets: Option[Int] = None) {
    def avgdl: Double = sumDl.toDouble / n
  }

  /** Two tokenize scans (cheap, deterministic) → one postings shuffle.
    * The POSTINGS frame is the materialization point — ~(tok, id, tf,
    * dl) rows, an order of magnitude smaller than the exploded token
    * arrays a pre-aggregation checkpoint would pin (the 500k-doc probe
    * spent most of its build materializing those). Stats and the terms
    * table both read the materialized postings. */
  def build(docs: DataFrame, idCol: String, textCol: String): Index = {
    // an integral id is a CONTRACT, not a convenience cast: a string id
    // would cast to null and every such document would merge into one
    // id=null postings group (summed tf, inflated avgdl) with no error
    val idType = docs.schema(idCol).dataType
    require(Seq("long", "integer", "short", "byte")
      .contains(idType.typeName),
      s"InvertedIndex needs an integral id column; '$idCol' is $idType " +
        "(map string ids to longs — e.g. xxhash64 — before indexing)")
    // Widen before the tokenize: a small corpus often arrives as ONE
    // parquet row group, serializing the regex tokenize+explode pass on
    // a single task (guide §2.5 input skew — measured 1.3 s of the
    // sf0.1 q158 build on one core). Byte-gated: corpus-scale inputs
    // keep their scan partitioning, no full-corpus shuffle is added.
    val toks = graft.plans.Widen(docs, factor = 2)
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokens(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")).cast("long"))
      .where(col("dl") > 0)
    val postings = toks
      .select(col("id"), col("dl"), explode(col("ts")).as("tok"))
      .groupBy(col("tok"), col("id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      // lazy: the stats aggregation (the very next job) materializes it;
      // an eager checkpoint here was one extra serial driver job
      .localCheckpoint(false)
    // corpus stats read off the checkpointed index, not a second
    // tokenize scan: Σ_postings tf = Σ_docs dl (every token lands in
    // exactly one posting), and nDocs = distinct posting ids — so the
    // corpus text is tokenized exactly ONCE per build
    val Array(nDocs, sumDl) = postings
      .agg(count_distinct(col("id")), sum(col("tf"))).collect()(0) match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
    val terms = postings.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), max(col("tf")).as("max_tf"),
        min(col("dl")).as("min_dl"))
    Index(postings, terms, nDocs, sumDl)
  }

  /** Persist with term-hash directory layout for query-time pruning. */
  def save(ix: Index, dir: String, numBuckets: Int = 64): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    ix.postings
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(numBuckets.toLong)))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("tok"), col("id"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    ix.terms
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(numBuckets.toLong)))
      .repartition(1).sortWithinPartitions(col("tok"))
      .write.mode("overwrite").parquet(s"$dir/terms")
    val meta = ix.postings.sparkSession
      .createDataFrame(Seq((ix.n, ix.sumDl, numBuckets)))
      .toDF("n", "sum_dl", "num_buckets")
    meta.repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Reopen a saved index. The postings frame keeps its `bucket` column
    * so [[topK]] can prune directories. */
  def load(spark: SparkSession, dir: String): Index = {
    val meta = spark.read.parquet(s"$dir/meta").collect()(0)
    Index(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/terms").drop("bucket"),
      meta.getAs[Long]("n"), meta.getAs[Long]("sum_dl"),
      Some(meta.getAs[Int]("num_buckets")))
  }

  /** Exact BM25 top-k over the index: (id, score, rank), score rounded
    * to 6 places, ties broken by id. `prune = true` applies the
    * rank-safe candidate cut (identical results, spec-enforced). */
  def topK(ix: Index, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, prune: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "query needs at least one term")
    require(k > 0, "k must be positive")
    val avgdl = ix.avgdl

    // directory pruning: a saved index exposes `bucket`; restrict the
    // scan to the query terms' buckets before the term filter
    val scan0 = ix.numBuckets match {
      case Some(nb) if ix.postings.columns.contains("bucket") =>
        // same hash the writer used, evaluated once on literals
        val buckets = ix.postings.sparkSession.range(1)
          .select(queryTerms.zipWithIndex.map { case (t, i) =>
            pmod(xxhash64(lit(t)), lit(nb.toLong)).as(s"b$i") }: _*)
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).distinct
        ix.postings.where(col("bucket").isin(buckets: _*))
      case _ => ix.postings
    }
    // materialized once: the θ pass, the survivor cut, and the final
    // aggregation all reread this query-sized frame instead of
    // re-scanning the bucket files
    val matched = scan0.where(col("tok").isin(queryTerms: _*))
      .select(col("tok"), col("id"), col("tf"), col("dl"))
      .localCheckpoint(false) // lazy: the θ pass / final agg materializes

    // per-term scalars (≤ |queryTerms| rows — a driver-side literal table)
    val stats = ix.terms.where(col("tok").isin(queryTerms: _*))
      .collect()
      .map { r =>
        val df = r.getAs[Long]("df")
        val maxTf = r.getAs[Long]("max_tf").toDouble
        val minDl = r.getAs[Long]("min_dl").toDouble
        val idf = math.log((ix.n - df + 0.5) / (df + 0.5) + 1.0)
        // weight is increasing in tf, decreasing in dl → exact per-term
        // upper bound at (max_tf, min_dl)
        val ub = idf * (maxTf * (k1 + 1)) /
          (maxTf + k1 * ((1 - b) + b * minDl / avgdl))
        (r.getAs[String]("tok"), df, idf, ub)
      }
    if (stats.isEmpty) {
      val spark = ix.postings.sparkSession
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType))))
    }
    val idfCol = coalesce(stats.map { case (t, _, idf, _) =>
      when(col("tok") === t, lit(idf)) }: _*)
    // exact per-posting weight — the same formula shape as TextAnalysis.bm25
    val weighted = matched.withColumn("w",
      idfCol.cast("double") * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))

    // the θ cut exists to shrink the PRE-aggregation volume at scale; its
    // two extra driver jobs (θ ranking + the semi-join) cost more than
    // they save when the matched postings are already small. The gate
    // reads the ALREADY-collected per-term dfs — no extra job — and the
    // cut is rank-safe, so skipping it is output-identical by
    // construction (spec-enforced both ways).
    val matchedPostings = stats.map(_._2).sum
    val candidates =
      if (!prune || stats.length == 1 || matchedPostings <= ThetaCutMinPostings) weighted
      else {
        // θ: k-th best exact partial score on the rarest term's postings
        // (a valid lower bound on the k-th best total — partial ≤ total)
        val rare = stats.minBy(_._2)._1
        val thetaRows = weighted.where(col("tok") === rare)
          .orderBy(col("w").desc).limit(k)
          .agg(min(col("w")), count(lit(1))).collect()(0)
        val theta =
          if (thetaRows.getLong(1) < k) Double.NegativeInfinity
          else thetaRows.getDouble(0)
        if (theta == Double.NegativeInfinity) weighted
        else {
          val ubTotal = stats.map(_._4).sum
          val ubCol = coalesce(stats.map { case (t, _, _, ub) =>
            when(col("tok") === t, lit(ub)) }: _*)
          // a doc can reach θ only if, for some matched posting, the
          // exact weight plus the other terms' upper bounds does. The
          // 1e-6 margin covers the final round(·, 6): without it a doc
          // whose exact total sits just under θ could still TIE a kept
          // doc after rounding and win the id tiebreak — the pruned and
          // unpruned top-k would then differ at the boundary
          val survivors = weighted
            .where(col("w") + (lit(ubTotal) - ubCol.cast("double")) >=
              lit(theta - 1e-6))
            .select(col("id")).distinct()
          weighted.join(survivors, "id")
        }
      }

    candidates.groupBy(col("id"))
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id").asc)))
  }

  /** Batch retrieval: ONE distributed plan scores many queries at once —
    * the serving-batch / evaluation shape (looping [[topK]] would launch
    * a Spark job per query). `queries` carries (qidCol, termsCol:
    * array<string>); output (qid, id, score, rank), rank 1..k per query,
    * score rounded to 6 places, ties broken by id — the same scoring
    * contract as [[topK]] minus the single-query candidate cut (the
    * pre-aggregation prune needs a per-query θ; with a query BATCH the
    * postings pass is shared, which is the batch trade).
    *
    * Scale shape: the (query, term, idf) table is broadcast into the
    * postings join (queries × terms is small by construction), scoring
    * is a narrow pass over matched postings, the per-(query, doc)
    * aggregation shuffles matched rows only, and ranking partitions by
    * query id. */
  def topKBatch(ix: Index, queries: DataFrame, qidCol: String,
      termsCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    // same contract as build()'s doc id: a string qid would cast to null
    // and every query's results would merge into one qid=null ranking
    // with no error
    val qidType = queries.schema(qidCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(qidType.typeName),
      s"topKBatch needs an integral query id column; '$qidCol' is $qidType " +
        "(map string ids to longs — e.g. xxhash64 — first)")
    val avgdl = ix.avgdl
    // distinct terms per query: topK scores each distinct term once
    // (isin matching) — exploding duplicates would double-count a
    // repeated term's weight and break the batch ≡ single contract
    val qt = queries.select(col(qidCol).cast("long").as("qid"),
      explode(array_distinct(col(termsCol))).as("tok"))
    val withIdf = qt.join(ix.terms.select(col("tok"), col("df")), Seq("tok"))
      .withColumn("idf",
        log((lit(ix.n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .select(col("qid"), col("tok"), col("idf"))
    val weighted = ix.postings.join(broadcast(withIdf), Seq("tok"))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("id").asc)
    weighted.groupBy(col("qid"), col("id"))
      .agg(round(sum(col("w")), 6).as("score"))
      .withColumn("rank", row_number().over(byQuery))
      .where(col("rank") <= k)
  }
}
