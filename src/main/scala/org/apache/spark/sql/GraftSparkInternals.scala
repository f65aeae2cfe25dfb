package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.execution.LogicalRDD

/** Minimal bridge into Spark-private surface (hence the package): one
  * helper, used by the iterative fixpoint operators.
  *
  * Spark 4's `Dataset.checkpoint` builds its `LogicalRDD` with
  * `originStats` = the PRE-checkpoint plan's estimated statistics, so
  * the truncated plan still plans joins with realistic sizes. For a
  * fixpoint loop that re-checkpoints each iteration this inheritance
  * compounds: join estimates are PRODUCTS of child sizes, so an
  * iteration whose plan joins the checkpointed state with itself k
  * times produces sizeInBytes ≈ S^k — the estimate's DIGIT COUNT grows
  * k-fold per iteration, and by ~iteration 8 Catalyst is multiplying
  * million-digit BigInts inside stats estimation: planning a single
  * take(1) burns minutes of driver CPU (observed: the round-9 SCC
  * rewrite hung its own spec there, in
  * SizeInBytesOnlyStatsPlanVisitor via canBroadcastBySize).
  *
  * The fix is to CAP the inherited size at checkpoint time. Capping is
  * planning-neutral: every capped value still far exceeds any
  * autoBroadcastJoinThreshold, and genuinely small states (the ones a
  * broadcast decision cares about) sit below the cap untouched. Row
  * counts and column stats pass through unchanged.
  */
object GraftSparkInternals {

  /** 1 PiB — astronomically above any broadcast threshold, harmlessly
    * below BigInt-blowup territory. */
  private val SizeCap: BigInt = BigInt(1L) << 50

  /** Call-site sugar: `df.localCheckpointCapped` via
    * `import org.apache.spark.sql.GraftSparkInternals.CappedCheckpoint`. */
  implicit class CappedCheckpoint(private val df: DataFrame) extends AnyVal {
    def localCheckpointCapped: DataFrame =
      GraftSparkInternals.localCheckpointCapped(df)
  }

  /** `df.localCheckpoint()` with the origin-stats size estimate capped,
    * so iterative self-join loops can checkpoint every round without
    * exponential stats compounding. `eager = false` defers the
    * materialization to the first consuming job (one fewer serial driver
    * job; Spark backfills any partitions that job skipped) — right when
    * the consumers are strictly downstream jobs, wrong when concurrent
    * stages would race to compute the frame. */
  def localCheckpointCapped(df: DataFrame, eager: Boolean = true): DataFrame = {
    val out = df.localCheckpoint(eager)
    out.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val stats = lr.computeStats()
        if (stats.sizeInBytes <= SizeCap) out
        else {
          val capped = stats.copy(sizeInBytes = SizeCap)
          val session = df.sparkSession.asInstanceOf[classic.SparkSession]
          val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            session, Some(capped), None)
          classic.Dataset.ofRows(session, fresh)
        }
      case _ => out
    }
  }
}
