package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** Cross-batch streaming NEAR-duplicate dedup — the fuzzy sibling of
  * [[StreamingExactDedup]]: a document is dropped when it is a
  * near-duplicate of an EMITTED document from an earlier micro-batch
  * (of this run or any previous run), and within a batch each near-dup
  * family keeps its minimum-id representative. "Near-duplicate" is
  * MinHash band-bucket collision — the same linear-edge criterion as
  * [[graft.dedup.FuzzyClusters.lshStarClusters]], which is what makes
  * the state FEASIBLE: the persisted index stores only the distinct
  * (band, bucket-hash) values of SURVIVING families — two longs per
  * band per document at most, independent of text size, shrinking under
  * duplication — instead of signatures or shingle sets. (Persisting a
  * dropped document's buckets would let content that was never emitted
  * suppress future novel documents; only represented content
  * fingerprints the seen-set.)
  *
  * Semantics are first-seen-wins (standard streaming dedup): a later
  * batch's family is dropped WHOLE when any member collides with a
  * seen bucket (its content was already represented — electing a new
  * keeper would duplicate it), and batches replayed after a crash are
  * idempotent (the "ignore my own batches ≥ mine" guard scoped to the
  * checkpoint-derived runId — [[DedupIndex]]'s rules, shared with the
  * exact sibling). Cross-batch TRANSITIVITY is deliberately not
  * re-closed — merging two already-emitted families retroactively would
  * require retracting emitted rows, which an append sink cannot do; a
  * periodic batch re-clustering ([[graft.dedup.FuzzyClusters]]) is the
  * repair path, the same recompute-and-swap rule the quad pipeline
  * uses.
  *
  * Ids must be integral (the family/keeper joins run on long ids; a
  * string id would cast to null and silently drop everything — fail
  * loudly instead). */
object StreamingFuzzyDedup {

  private def requireIntegralId(batch: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types._
    val t = batch.schema(idCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(t),
      s"StreamingFuzzyDedup needs an integral id column; '$idCol' is $t " +
        "(map string ids to longs — e.g. xxhash64 — before deduping)")
  }

  /** Batch kernel: returns the batch's surviving keeper rows and
    * persists the SURVIVING families' bucket memberships under
    * `run=<runId>/batch=<batchId>`. */
  def dedupBatch(batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, runId: String, batchId: Long,
      k: Int = 2, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    requireIntegralId(batch, idCol)
    val spark = batch.sparkSession
    val banded = Dedup.minhashBandBuckets(batch, textCol, idCol, k, numHashes, bands)
      .localCheckpoint() // read 3x: families, seen-join, persist
    // within-batch star families: every doc labeled with its family root
    val hubs = banded.groupBy(col("band"), col("bandHash"))
      .agg(min(col("id")).as("hub"))
    val edges = banded.join(hubs, Seq("band", "bandHash"))
      .where(col("id") =!= col("hub"))
      .select(col("hub").as("src"), col("id").as("dst"))
      .distinct()
    val comps = graft.graph.GraphOps.connectedComponents(edges)
    val fam = batch.select(col(idCol).cast("long").as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("fam"))
      .localCheckpoint()

    // families with ANY member colliding with a seen bucket drop whole
    val earlier = DedupIndex.earlierPaths(indexDir, runId, batchId,
      spark.sparkContext.hadoopConfiguration)
    val dupFams =
      if (earlier.isEmpty) fam.limit(0).select(col("fam"))
      else banded
        .join(spark.read.parquet(earlier: _*)
          .select(col("band"), col("bandHash")), Seq("band", "bandHash"),
          "left_semi")
        .select(col("id")).distinct()
        .join(fam, Seq("id")).select(col("fam")).distinct()
    val keptMembers = fam.join(dupFams, Seq("fam"), "left_anti")
      .localCheckpoint() // read 2x: keeper join + bucket persist
    val keepers = keptMembers
      .where(col("id") === col("fam")) // min-id representative
      .select(col("id"))

    val out = batch
      .join(keepers.withColumnRenamed("id", "__keep_id"),
        col(idCol).cast("long") === col("__keep_id"))
      .drop("__keep_id")
      .localCheckpoint()
    // persist buckets of surviving families only (every member — the
    // keeper REPRESENTS the family, so the whole family's fingerprint
    // is "seen"); dropped families contribute nothing
    banded.join(keptMembers.select(col("id")), Seq("id"), "left_semi")
      .select(col("band"), col("bandHash")).distinct()
      .write.mode("overwrite")
      .parquet(s"$indexDir/run=$runId/batch=$batchId")
    out
  }

  /** Leakage-safe split tag for an EMITTED keeper batch — stage 10 of
    * the batch curation pipeline ([[graft.tools.Curate]]) as a streaming
    * map. An emitted keeper IS its near-dup family's min-id root
    * ([[dedupBatch]]'s keeper rule), and the batch pipeline's cluster id
    * is the same min-label ([[graft.dedup.FuzzyClusters]] `assign`), so
    * the keeper's cluster id equals its own id and the split is the
    * pure function `f(cluster_id)` of [[graft.text.Sampling
    * .leakageSafeSplit]] — no state, no shuffle, stable across batches
    * and runs. Under monotone id arrival the tag matches a batch Curate
    * run over the same corpus exactly: a later near-dup never emits here
    * (first-seen-wins) and in batch inherits this keeper's cluster —
    * hence this keeper's split (StreamingCurationSpec pins the
    * equivalence). Output: the batch plus `cluster_id` and `split`. */
  def splitTag(keepers: DataFrame, idCol: String,
      weights: Seq[Int] = Seq(8, 1, 1)): DataFrame = {
    requireIntegralId(keepers, idCol)
    graft.text.Sampling.leakageSafeSplit(
      keepers.withColumn("cluster_id", col(idCol).cast("long")),
      "cluster_id", weights)
  }

  /** Streaming wiring — identical contract to
    * [[StreamingExactDedup.start]] (checkpoint-derived runId). */
  def start(docs: DataFrame, textCol: String, idCol: String,
      indexDir: String, checkpointDir: String)(
      sink: DataFrame => Unit): StreamingQuery = {
    val runId = DedupIndex.runIdAt(checkpointDir, indexDir,
      docs.sparkSession.sparkContext.hadoopConfiguration)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(dedupBatch(batch, textCol, idCol, indexDir, runId, batchId))
      }
      .start()
  }
}
