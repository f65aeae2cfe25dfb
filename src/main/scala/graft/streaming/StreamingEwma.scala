package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming fixed-point EWMA levels — [[graft.operators.Ewma]] as a
  * maintained per-key state table: each micro-batch folds its (ordered)
  * observations into the persisted level, so a monitoring stream keeps
  * bit-exact smoothed baselines across restarts without re-reading
  * history. State is one row per key; each batch writes the FULL
  * updated table under `run=<id>/batch=<id>` (same replay rule as the
  * dedup/CMS indexes: a re-run batch overwrites its own directory and
  * folds from the LATEST strictly-earlier batch, so replay output is
  * bit-identical).
  *
  * When batch boundaries respect event order per key, the maintained
  * level equals the one-shot batch fold exactly (spec-pinned). A
  * cross-batch late arrival folds in arrival order — the standard
  * streaming-EWMA compromise; route late data through an event-time
  * window upstream if that matters.
  *
  * KNOWN LIMIT — one fresh-checkpoint redeploy per state dir: the fold
  * base is "my latest batch, else the highest batch id of any other
  * run", which is correct for a single redeploy but ambiguous after
  * TWO fresh-checkpoint redeploys whose batch counters overlap (the
  * pick falls back to the globally highest batch id, which may belong
  * to the older run). Start a fresh redeploy against a NEW stateDir,
  * or keep the checkpoint so the runId (and fold chain) is preserved.
  */
object StreamingEwma {

  /** Fold `batch` into the persisted levels; returns the full updated
    * state (keyCol, n_obs, ewma). */
  def observeBatch(batch: DataFrame, keyCol: String, orderCol: Column,
      tieCol: Column, valueCol: Column, alphaNum: Int, k: Int,
      stateDir: String, runId: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val den = 1L << k
    require(alphaNum > 0 && alphaNum < den, "alpha must be in (0, 1)")
    val incoming = batch
      .select(col(keyCol), struct(orderCol.as("o"), tieCol.as("t"),
        valueCol.cast("long").as("v")).as("obs"))
      .where(col("obs.v").isNotNull && col("obs.o").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_new"), collect_list(col("obs")).as("arr"))
    val prior = DedupIndex.earlierPaths(stateDir, runId, batchId,
      batch.sparkSession.sparkContext.hadoopConfiguration)
      // state is cumulative: only the latest earlier batch matters, and
      // THIS run's batches win over any other run's — after a
      // fresh-checkpoint redeploy (new runId, batch ids restart at 0)
      // the new run must fold from its own accumulated state, not the
      // old run's final (higher-numbered) batch
      .sortBy(p => (p.contains(s"run=$runId/"),
        p.split("batch=").last.toLong)).lastOption
      .map(spark.read.parquet(_))
      // first batch: an empty state frame in the incoming key's type
      .getOrElse(incoming.select(col(keyCol), lit(0L).as("n_obs"),
        lit(null).cast("long").as("ewma")).where(lit(false)))
    val updated = prior.withColumnRenamed("ewma", "prior_ewma")
      .withColumnRenamed("n_obs", "prior_n")
      .join(incoming, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("prior_n"), lit(0L)) +
          coalesce(col("n_new"), lit(0L))).as("n_obs"),
        coalesce(
          expr(s"""aggregate(array_sort(arr), prior_ewma,
            | (acc, x) -> case when acc is null then x.v
            |   else ($alphaNum * x.v + ${den - alphaNum} * acc) div $den
            |   end)""".stripMargin),
          col("prior_ewma")).as("ewma"))
      .localCheckpoint()
    updated.write.mode("overwrite")
      .parquet(s"$stateDir/run=$runId/batch=$batchId")
    updated
  }
}
