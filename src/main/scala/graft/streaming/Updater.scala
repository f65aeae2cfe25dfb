package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rdf.{Quad, QuadDiff, QuadStore}

/** Write-back update routing — the reference's Updater
  * (`core/src/main/com/thymeflow/update/Updater.scala:26-197`): a SPARQL
  * UPDATE diff is split per named graph; portions owned by writable
  * sources are applied there, portions on read-only graphs fall through to
  * the user graph, and failed *removals* are recorded as negation
  * statements (`Negation.scala:16-23`) so the pipeline's J5 guard keeps
  * re-ingested copies suppressed.
  */
object Updater {

  val UserGraph = "graft:user"
  val NegationGraph = "graft:negations"

  final case class UpdateResult(
      store: DataFrame, // store after the update
      negations: DataFrame, // new negation quads (for the J5 guard)
      rejectedAdds: DataFrame) // structurally EMPTY: every non-writable
      // addition is redirected to the user graph (the reference's
      // "failures land in the user graph" rule), so nothing is ever
      // rejected outright; the field keeps the three-way result shape
      // for callers that distinguish redirection policies

  /** @param writableGraphs graphs whose owning source accepts writes; the
    *        reference's FileSynchronizer-style sources refuse
    *        (`FileSynchronizer.scala:311-319`), DAV sources accept. */
  def applyUpdate(
      store: DataFrame,
      diff: QuadDiff,
      writableGraphs: Set[String]): UpdateResult = {
    val writable = typedLit(writableGraphs.toSeq)
    // additions: writable graphs keep their graph; everything else lands
    // in the user graph (reference: "failures land in the user graph")
    val adds = diff.added
      .withColumn("g",
        when(array_contains(writable, col("g")) || col("g") === UserGraph, col("g"))
          .otherwise(lit(UserGraph)))
    // removals: allowed on writable graphs and the user graph; a removal
    // on a read-only graph cannot be applied at the source -> record a
    // negation statement instead
    val removable = diff.removed
      .where(array_contains(writable, col("g")) || col("g") === UserGraph)
    val failedRemovals = diff.removed
      .where(!(array_contains(writable, col("g")) || col("g") === UserGraph))
    val negations = failedRemovals
      .select(col("s"), col("p"), col("o"), col("oKind"), col("oDt"), col("oLang"))
      .distinct()
      .withColumn("g", lit(NegationGraph))
      .select(store.columns.map(col): _*)
    val applied = QuadStore.applyDiff(store,
      QuadDiff(adds.unionByName(negations), removable))
    // suppressed immediately as well: negated statements leave the store.
    // The probe side is DISTINCT on (s,p,o): `negations` dedupes on six
    // columns, so two negation variants sharing (s,p,o) (different
    // oLang/oDt) would otherwise fan the join out and duplicate every
    // surviving NegationGraph row for that key on each update
    val guarded = applied.join(
      negations.select(col("s"), col("p"), col("o")).distinct()
        .withColumn("__neg", lit(1)),
      Seq("s", "p", "o"), "left_outer")
      .where(col("__neg").isNull || col("g") === NegationGraph)
      .drop("__neg")
    UpdateResult(guarded, negations, diff.added.limit(0))
  }
}
