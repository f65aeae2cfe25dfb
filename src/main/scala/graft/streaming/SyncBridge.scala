package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.rdf.{Quad, QuadDiff, QuadStore}

/** Bridges a protocol synchronizer's delta ([[graft.sources.DavSync]],
  * [[graft.sources.ImapSync]]) into one pipeline step — the reference
  * Pipeline's addDocument/removeDocument pair
  * (`core/src/main/com/thymeflow/Pipeline.scala:61-93`): new/changed
  * documents convert into their per-document graphs and land with
  * replace semantics through [[QuadPipeline.processBatch]]; vanished
  * documents clear their graphs. The protocol leg is driver-side I/O;
  * conversion and the store rewrite are the distributed part. */
object SyncBridge {

  /** Apply one sync round. `docs` are (docId, body) pairs for fetched
    * documents; `removedIds` are docIds whose graphs must clear;
    * `convert` is the matching converter (email/ical/vcard — all assign
    * graph `doc:<docId>`). Returns (new store, full round diff). */
  def applyDelta(
      store: DataFrame,
      docs: Seq[(String, String)],
      removedIds: Seq[String],
      convert: Dataset[(String, String)] => Dataset[Quad],
      negations: DataFrame,
      enrichers: Seq[QuadPipeline.Enricher]): (DataFrame, QuadDiff) = {
    val spark = store.sparkSession
    import spark.implicits._
    val removedGraphs = removedIds.map(id => s"doc:$id")
    val removalDiff = QuadDiff(
      store.limit(0),
      if (removedGraphs.isEmpty) store.limit(0)
      else store.filter(col("g").isin(removedGraphs: _*)))
    val afterRemove = QuadStore.applyDiff(store, removalDiff)
    val batch =
      if (docs.isEmpty) afterRemove.limit(0)
      else convert(docs.toDS()).toDF().select(afterRemove.columns.map(col): _*)
    val (next, diff) = QuadPipeline.processBatch(afterRemove, batch, negations, enrichers)
    (next, removalDiff.union(diff))
  }
}
