package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline / Pareto frontier (Börzsönyi et al., ICDE 2001):
  * maximize both dimensions; keep every row no other row strictly
  * dominates (other.x ≥ x ∧ other.y ≥ y ∧ one strict). The standard
  * multi-criteria shortlist ("newest AND biggest", price-vs-quality
  * cuts in corpus curation).
  *
  * Two stages, both exact:
  *   1. per-partition prefilter — sort each partition by x desc and
  *      scan with a running y-max, dropping rows another row of the
  *      SAME partition strictly dominates. Sound (a dominator survives
  *      in its own partition, domination is transitive) and it shrinks
  *      the global stage's input from n to the union of local
  *      frontiers.
  *   2. global pass on the survivors with two windows sharing one sort:
  *      mx_gt = max(y) over x-desc RANGE frame ending 1 PRECEDING
  *      (strictly-greater x — integer dims make the range bound exact),
  *      mx_eq = max(y) over the equal-x partition. A row survives iff
  *      (mx_gt is null ∨ mx_gt < y) ∧ mx_eq = y.
  * The global window runs on frontier-sized data (typically ≪ n; worst
  * case — a fully non-dominated anti-chain — IS the answer). The result
  * is a deterministic SET, restated by the oracle with the same windows
  * over the raw table. */
object Skyline {

  /** Integer dims (cast to long). Output: (idCol, xCol, yCol) skyline
    * rows. */
  def pareto2D(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))

    // stage 1: local strict-domination prefilter
    val local = base.sortWithinPartitions(col("x").desc, col("y").desc)
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var maxY = Long.MinValue
        var curX = Long.MinValue
        var curXMaxY = Long.MinValue
        it.flatMap { case (id, x, y) =>
          if (x != curX) { // entering a new (smaller) x group
            maxY = math.max(maxY, curXMaxY)
            curX = x; curXMaxY = Long.MinValue
          }
          curXMaxY = math.max(curXMaxY, y)
          // dominated locally iff some earlier row had x' > x ∧ y' ≥ y
          if (maxY >= y) None else Some((id, x, y))
        }
      }.toDF("id", "x", "y")

    // stage 2: exact global windows on the reduced set
    val wStrict = Window.orderBy(col("x").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("x"))
    local
      .withColumn("mx_gt", max(col("y")).over(wStrict))
      .withColumn("mx_eq", max(col("y")).over(wEq))
      .where((col("mx_gt").isNull || col("mx_gt") < col("y")) &&
        col("mx_eq") === col("y"))
      .select(col("id").as(idCol), col("x").as(xCol), col("y").as(yCol))
  }
}
