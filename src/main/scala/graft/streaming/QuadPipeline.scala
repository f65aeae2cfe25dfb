package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.rdf.{Quad, QuadDiff, QuadStore}

/** Incremental enrichment pipeline — the Structured-Streaming re-expression
  * of the reference's Akka-Streams dataflow (`core/src/main/com/thymeflow/
  * Pipeline.scala:37-120`):
  *
  *   sources → document quads → replace-graph upsert (T2) → enricher chain
  *   (T4, each stage writes its own provenance graph and enlarges the
  *   flowing diff) → store.
  *
  * Each micro-batch plays the role of one "document batch": `foreachBatch`
  * computes the replace-diff against the store, applies enrichers in the
  * reference's fixed order, and commits graph-partitioned output. The
  * debounce stage (T3, reference DelayedBatch 10 s quiet period) maps to
  * the processing-time trigger; an exact-quiet-period variant is provided
  * via flatMapGroupsWithState in [[Debounce]].
  */
object QuadPipeline {

  /** An enricher: given (store snapshot, incoming diff) produce additional
    * quads in its own provenance graph (reference Enricher.enrich,
    * `core/src/main/com/thymeflow/enricher/Enricher.scala:9-19`). */
  type Enricher = (DataFrame, QuadDiff) => QuadDiff

  /** Guard wrapper (T5): run the enricher only when the diff contains
    * relevant additions (reference LocationStayEnricher.scala:45-50). */
  def guarded(relevant: DataFrame => DataFrame)(e: Enricher): Enricher =
    (store, diff) =>
      if (relevant(diff.added).isEmpty) QuadDiff(diff.added.limit(0), diff.removed.limit(0))
      else e(store, diff)

  /** One batch step: upsert the batch's document graphs into the store
    * (replace semantics per graph), honor negations, then run the enricher
    * chain accumulating diffs. Returns the new store.
    * This is the exact batch analogue of Pipeline.addDocumentToRepository
    * followed by the enricher flow. */
  def processBatch(
      store: DataFrame,
      batchQuads: DataFrame,
      negations: DataFrame,
      enrichers: Seq[Enricher]): (DataFrame, QuadDiff) = {
    val spark = store.sparkSession
    import spark.implicits._
    // replace-diff per incoming graph, all graphs at once:
    val incomingGraphs = batchQuads.select("g").distinct()
    val scoped = store.join(incomingGraphs, Seq("g"), "left_semi")
    val added0 = batchQuads.join(scoped, Seq("s", "p", "o", "g"), "left_anti")
    val removed = scoped.join(batchQuads, Seq("s", "p", "o", "g"), "left_anti")
    val added = QuadStore.guardAgainstNegations(added0, negations)
    var diff = QuadDiff(
      added.select(store.columns.map(col): _*),
      removed.select(store.columns.map(col): _*))
    var cur = QuadStore.applyDiff(store, diff)
    enrichers.foreach { e =>
      val d = e(cur, diff)
      val guarded = QuadDiff(
        QuadStore.guardAgainstNegations(
          d.added.select(cur.columns.map(col): _*), negations),
        d.removed.select(cur.columns.map(col): _*))
      cur = QuadStore.applyDiff(cur, guarded)
      diff = diff.union(guarded)
    }
    (cur, diff)
  }

  /** Wire a streaming quad source through the batch processor into a
    * g-partitioned parquet store. The store is re-read per batch (pruned
    * scans: only the touched partitions are materialized by the diff
    * joins), and ONLY the graph partitions the batch's diff touched are
    * rewritten (dynamic partition overwrite — the T6 machinery); a graph
    * the diff emptied has its partition directory dropped. Untouched
    * partitions are not read back, not rewritten, and stay byte-identical
    * — the property a 100 TB store needs from a per-10s micro-batch sink
    * (the reference rewrites per-graph too: replaceGraph in
    * `core/src/main/com/thymeflow/rdf/RepositoryLoader.scala`). */
  def run(
      spark: SparkSession,
      quadStream: DataFrame,
      storePath: String,
      negations: DataFrame,
      enrichers: Seq[Enricher],
      triggerMs: Long = 10000,
      onStore: DataFrame => Unit = _ => ()): DataStreamWriter[org.apache.spark.sql.Row] = {
    quadStream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import spark.implicits._
        val path = new org.apache.hadoop.fs.Path(storePath)
        val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
        val store =
          if (fs.exists(path)) spark.read.schema(Quad.schema).parquet(storePath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Quad.schema)
        val (next, diff) = processBatch(store, batch, negations, enrichers)
        val touched = diff.added.select("g").union(diff.removed.select("g"))
          .distinct().as[String].collect()
        if (touched.nonEmpty) {
          // one materialization of the touched slice; dynamic overwrite
          // replaces exactly the partitions present in it
          val touchedNext = next.where(col("g").isin(touched.toSeq: _*)).localCheckpoint()
          val stillPresent = touchedNext.select("g").distinct().as[String].collect().toSet
          if (stillPresent.nonEmpty) QuadStore.write(touchedNext, storePath)
          // graphs the diff emptied entirely: dynamic overwrite writes no
          // partition for them, so drop the stale directory explicitly
          (touched.toSet -- stillPresent).foreach { g =>
            val dir = new org.apache.hadoop.fs.Path(path,
              "g=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .escapePathName(g))
            if (fs.exists(dir)) fs.delete(dir, true)
          }
          // publish the refreshed store to any live consumer (e.g. a
          // SPARQL endpoint swapping its served snapshot — the
          // reference's pipeline->repository->SparqlService shape).
          // localCheckpoint PINS the snapshot in block storage: the next
          // micro-batch deletes/rewrites partition directories, and a
          // lazy file-backed plan served concurrently would hit
          // FileNotFoundException / mixed-version reads. (At real
          // cluster scale the equivalent is an MVCC manifest layout;
          // for a served store the working set is resident either way.)
          onStore(spark.read.schema(Quad.schema).parquet(storePath)
            .localCheckpoint(eager = true))
        }
      }
  }
}

/** Exact debounce/conflation (reference `core/src/main/com/thymeflow/
  * enricher/DelayedBatch.scala:15-131`): accumulate diffs per key, emit only
  * after `quietMs` of processing-time silence, merging diffs associatively
  * while waiting. */
object Debounce {

  final case class Keyed(key: String, payload: String)
  final case class Buffered(payloads: Seq[String])

  /** flatMapGroupsWithState flush-after-quiet: returns the conflated batch
    * per key once no new element arrived for quietMs. */
  def debounced(
      ds: org.apache.spark.sql.Dataset[Keyed],
      quietMs: Long): org.apache.spark.sql.Dataset[Buffered] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[String], Buffered](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: String, values: Iterator[Keyed], state: GroupState[Seq[String]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(Buffered(_)).iterator
            state.remove()
            out
          } else {
            val merged = state.getOption.getOrElse(Seq.empty) ++ values.map(_.payload)
            state.update(merged)
            state.setTimeoutDuration(quietMs)
            Iterator.empty
          }
      }
  }
}
