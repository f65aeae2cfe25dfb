package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Byte-gated input widening for CPU-heavy map passes.
  *
  * A small table often arrives as ONE unsplittable parquet row group, so
  * a regex tokenize / shingle pass over it runs as a single task and
  * pays its whole interpreted-then-JIT warmup serially (the round-7
  * q30/q28 cold-time profile). Conversely, unconditionally
  * repartitioning before such a pass is a full-corpus shuffle at real
  * scale, where the scan already splits into thousands of partitions.
  *
  * This helper resolves the tension with optimizer statistics (never
  * triggers a job): inputs under [[DefaultMaxBytes]] round-robin to
  * `factor × defaultParallelism` partitions; larger inputs pass through
  * untouched and rely on scan-time splitting. */
object Widen {

  /** Above this the scan's natural parallelism is assumed sufficient. */
  val DefaultMaxBytes: Long = 1L << 28 // 256 MB

  /** True iff physical planning of `plan` cannot introduce an exchange:
    * scans/checkpoints under narrow row-local operators only. The
    * partition-count probe below reads `df.rdd`, which under AQE
    * MATERIALIZES every query stage of the plan — a job, exactly what
    * this helper promises never to run. Restricting the probe to
    * provably exchange-free plans makes `df.rdd` a pure partition-count
    * read (physical planning of a narrow chain, no stages to run). */
  private def exchangeFree(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case n if !(n.isInstanceOf[LeafNode] || n.isInstanceOf[Project] ||
        n.isInstanceOf[Filter] || n.isInstanceOf[Generate] ||
        n.isInstanceOf[SubqueryAlias] || n.isInstanceOf[Union] ||
        n.isInstanceOf[LocalLimit] || n.isInstanceOf[DeserializeToObject] ||
        n.isInstanceOf[SerializeFromObject] || n.isInstanceOf[TypedFilter] ||
        n.isInstanceOf[MapPartitions]) => n
    }.isEmpty

  /** @param minBytes below this the input passes through untouched even
    *   when it sits on one partition: a serial map pass over a tiny
    *   input is cheaper than the round-robin exchange (callers whose
    *   downstream already shuffles — e.g. a window/groupBy right after —
    *   set this so bench-sized inputs skip the extra exchange while
    *   large few-partition inputs, where the map pass dominates, still
    *   widen). */
  def apply(df: DataFrame, factor: Int = 1,
      maxBytes: Long = DefaultMaxBytes, minBytes: Long = 0L): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism * factor
    val stats = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (stats < minBytes) return df
    val smallBytes = stats < maxBytes
    // Bytes alone is the wrong gate when a LARGE input sits on FEW
    // partitions (e.g. the stream side of a broadcast join inheriting a
    // one-row-group scan): the pass would run near-serial no matter its
    // size — that case needs the widen MOST. Physical partition count is
    // read off the compiled plan, but ONLY when the plan is provably
    // exchange-free (r16 hardening): on a plan with an exchange, `.rdd`
    // under AQE would materialize the upstream stages — a full job — to
    // learn a partition count the post-shuffle planner controls anyway.
    // At real scale scans split into thousands of partitions and both
    // clauses are false, so no full-corpus shuffle is ever added.
    lazy val fewParts = exchangeFree(df.queryExecution.optimizedPlan) &&
      df.rdd.getNumPartitions < p
    if (smallBytes || fewParts) df.repartition(p) else df
  }
}
